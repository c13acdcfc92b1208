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
from typing import Dict, List, Optional, Tuple

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
# iota form `replica_groups=[2,4]<=[8]` (2 groups of 4) or explicit form
# `replica_groups={{0,1,2,3},{4,5,6,7}}`
_GROUPS_IOTA_RE = re.compile(r"replica_groups=\[(\d+),(\d+)\]")
_GROUPS_LIST_RE = re.compile(r"replica_groups=\{\{([0-9,]+)\}")


def _dtype_bytes(dtype: str) -> int:
    """HLO element type -> bytes (pred is 1 byte; `f32`/`bf16`/`s8`...)."""
    if dtype == "pred":
        return 1
    digits = "".join(c for c in dtype if c.isdigit())
    return max(1, int(digits) // 8) if digits else 4


@dataclasses.dataclass
class CollectiveOp:
    """One collective instruction in a compiled program."""

    op: str  # canonical name, e.g. "all-gather"
    shapes: Tuple[Tuple[int, ...], ...]  # output shape(s)
    line: str
    dtypes: Tuple[str, ...] = ()  # element type per shape, aligned

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

    @property
    def output_bytes(self) -> int:
        """Largest output shape's byte size.

        "Largest" (not summed) because async `-start` variants emit a
        tuple aliasing (operand, output) — summing would double-count;
        the transfer-relevant tensor is the largest member. (A fused
        multi-operand collective is undercounted — acceptable, the
        budget tests use >= assertions on deliberate regressions.)
        """
        best = 0
        dtypes = self.dtypes or ("f32",) * len(self.shapes)
        for shape, dtype in zip(self.shapes, dtypes):
            n = _dtype_bytes(dtype)
            for d in shape:
                n *= d
            best = max(best, n)
        return best

    @property
    def group_size(self) -> Optional[int]:
        """Devices participating per replica group (None when unparsed)."""
        m = _GROUPS_IOTA_RE.search(self.line)
        if m:
            return int(m.group(2))
        m = _GROUPS_LIST_RE.search(self.line)
        if m:
            return len(m.group(1).split(","))
        return None

    def ici_bytes(self, default_group: Optional[int] = None) -> int:
        """Per-chip ICI traffic (bytes SENT by one chip) for one execution
        of this instruction, assuming bandwidth-optimal ring algorithms —
        the standard roofline accounting (ring all-gather sends
        out*(n-1)/n per chip, ring all-reduce 2*S*(n-1)/n, a ppermute one
        block, all-to-all S*(n-1)/n).

        HLO output shapes are per-partition in SPMD programs, so
        `output_bytes` is already the per-chip tensor: for all-gather the
        gathered (full-axis) output, for reduce-scatter the scattered
        shard, for all-reduce/ppermute/all-to-all the local block.
        """
        if self.op == "collective-permute":
            # one block to one peer; group size is irrelevant
            # (ppermute lines carry source_target_pairs, not groups)
            return self.output_bytes
        n = self.group_size or default_group
        if not n or n <= 1:
            return 0
        out = self.output_bytes
        if self.op == "all-gather":
            return out * (n - 1) // n
        if self.op == "reduce-scatter":
            return out * (n - 1)
        if self.op == "all-reduce":
            return 2 * out * (n - 1) // n
        if self.op == "all-to-all":
            return out * (n - 1) // n
        return out  # unknown op: count its output once (conservative)


def collective_inventory(hlo_text: str) -> List[CollectiveOp]:
    """All collective instructions in `compiled.as_text()` output."""
    out: List[CollectiveOp] = []
    for line in hlo_text.splitlines():
        m = _OP_RE.search(line)
        if m is None:
            continue
        head = line[: m.start()]
        found = _SHAPE_RE.findall(head)
        shapes = tuple(
            tuple(int(d) for d in dims.split(",") if d)
            for _, dims in found
        )
        dtypes = tuple(dtype for dtype, _ in found)
        out.append(CollectiveOp(m.group(1), shapes, line.strip(), dtypes))
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


def program_ici_bytes(
    hlo_text: str, default_group: Optional[int] = None
) -> Dict[str, int]:
    """Per-chip ICI bytes sent per execution of the program, by op kind
    (plus a "total" key) — the communication side of the scaling
    roofline (docs/PARALLELISM.md "ICI roofline").

    Static accounting: each collective instruction is counted ONCE. For
    a program whose collectives sit inside a `lax.scan`/while body (e.g.
    a fused `sample()` loop), this is bytes per *iteration* only if you
    compiled the single-step function; compile the step, not the scan,
    when budgeting per-step bytes.
    """
    out: Dict[str, int] = {op: 0 for op in COLLECTIVE_OPS}
    total = 0
    for op in collective_inventory(hlo_text):
        b = op.ici_bytes(default_group)
        out[op.op] = out.get(op.op, 0) + b
        total += b
    out["total"] = total
    return out
