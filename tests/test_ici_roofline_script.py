"""Regression guard for scripts/ici_roofline.py's program builders.

The round-5 roofline initially closed over the TP-sharded params instead
of passing them as jit arguments; GSPMD treated the sharded trees as
compile-time constants and lowered a fully-replicated program with ZERO
collectives — a silently-wrong roofline (docs/ici_roofline.json would
price TP at perfect scaling). This pins the fix: every roofline program,
built with the script's own builders at --quick shapes, must contain the
collective traffic its published row is derived from.
"""

from __future__ import annotations

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))
sys.path.insert(0, REPO)

import ici_roofline  # noqa: E402  (scripts/ici_roofline.py)

from perceptor_tpu.utils.hlo import program_ici_bytes  # noqa: E402


@pytest.fixture(scope="module")
def quick_nets():
    return ici_roofline._build_nets(quick=True)


def test_tp_program_has_collectives(quick_nets):
    """TP params must be jit ARGUMENTS: the closed-over-constants
    regression lowers to zero collectives and prices TP at perfect
    scaling."""
    txt = ici_roofline._compile_tp(quick_nets, 2, 64)
    bytes_by_op = program_ici_bytes(txt, default_group=2)
    assert bytes_by_op["total"] > 0, bytes_by_op
    # Megatron TP must produce activation psums (all-reduce); pure
    # resharding traffic alone would also indicate a broken layout.
    assert bytes_by_op.get("all-reduce", 0) > 0, bytes_by_op


def test_cp_program_has_collectives(quick_nets):
    """The context-parallel guided step's roofline rests on its
    attention/resharding collective traffic (ppermute ring or Ulysses
    all-to-all depending on the priced routing at these shapes); a lost
    input sharding would lower a replicated program with zero bytes."""
    txt = ici_roofline._compile_cp(quick_nets, 2, 256)
    bytes_by_op = program_ici_bytes(txt, default_group=2)
    assert bytes_by_op["total"] > 0, bytes_by_op
