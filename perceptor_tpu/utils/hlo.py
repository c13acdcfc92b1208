"""Compiled-HLO inspection: the collective inventory of a program.

In a single-chip CI environment, the only available multi-chip *perf*
signal is the structure of the compiled program itself: which
collectives GSPMD inserted, and at what shapes. A silent sharding
regression — a lost `with_sharding_constraint` that makes XLA all-gather
the full token axis every step — passes every numeric parity test while
destroying the multi-chip story. `collective_inventory` parses
`jit(f).lower(...).compile().as_text()` so tests (and users profiling a
sharded program) can assert the inventory: which collectives appear,
how many, and how big their outputs are.

This guards the rebuild's replacement for the reference's wired-in
xformers attention (reference stable_diffusion.py:68-80) — the
reference's version demonstrably ran fast, not just correctly; here the
compiled collective structure is the fast/slow witness.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Dict, List, Tuple

COLLECTIVE_OPS = (
    "all-gather",
    "all-reduce",
    "reduce-scatter",
    "collective-permute",
    "all-to-all",
)

# `%name = f32[2,8,512,64]{3,2,1,0} collective-permute(...)`, tuple-shaped
# and async (`-start`) variants included; `-done` carries no new transfer.
_SHAPE_RE = re.compile(r"\b([a-z]\d*|pred|bf16|f32|f16|s32|u32|s8|u8)\[([0-9,]*)\]")
_OP_RE = re.compile(
    r"\b(" + "|".join(COLLECTIVE_OPS) + r")(-start)?\("
)


@dataclasses.dataclass
class CollectiveOp:
    """One collective instruction in a compiled program."""

    op: str  # canonical name, e.g. "all-gather"
    shapes: Tuple[Tuple[int, ...], ...]  # output shape(s)
    line: str

    @property
    def elements(self) -> int:
        """Largest output shape's element count."""
        best = 0
        for shape in self.shapes:
            n = 1
            for d in shape:
                n *= d
            best = max(best, n)
        return best


def collective_inventory(hlo_text: str) -> List[CollectiveOp]:
    """All collective instructions in `compiled.as_text()` output."""
    out: List[CollectiveOp] = []
    for line in hlo_text.splitlines():
        m = _OP_RE.search(line)
        if m is None:
            continue
        head = line[: m.start()]
        shapes = tuple(
            tuple(int(d) for d in dims.split(",") if d)
            for _, dims in _SHAPE_RE.findall(head)
        )
        out.append(CollectiveOp(m.group(1), shapes, line.strip()))
    return out


def collective_counts(hlo_text: str) -> Dict[str, int]:
    """{op name: count} over the program."""
    counts: Dict[str, int] = {}
    for op in collective_inventory(hlo_text):
        counts[op.op] = counts.get(op.op, 0) + 1
    return counts


def max_gather_elements(hlo_text: str) -> int:
    """Largest all-gather output in the program (0 when none) — the
    headline regression witness: a re-gathered full token axis shows up
    here as an activation-sized number."""
    return max(
        (op.elements for op in collective_inventory(hlo_text)
         if op.op == "all-gather"),
        default=0,
    )
