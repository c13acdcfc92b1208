"""Unit tests for the HLO collective-inventory parser (utils/hlo.py).

The collective-structure guard (test_collective_structure.py) depends on
this parser reading compiled HLO text correctly; these tests pin the
line formats it must handle (plain, async -start/-done, tuple shapes,
bf16 dtypes) against hand-written instruction lines so a jax/XLA
format drift fails here with a clear message instead of silently
weakening the guard.
"""

from perceptor_tpu.utils.hlo import (
    collective_counts,
    collective_inventory,
    max_gather_elements,
)

SAMPLE = """\
HloModule jit_f
%fused (p0: f32[2,8,512,64]) -> f32[2,8,512,64] {
  %ppermute.62 = f32[2,8,512,64]{3,2,1,0} collective-permute(%param.4), channel_id=1, source_target_pairs={{0,1},{1,2}}
  %all-gather = f32[2,8,4096,64]{3,1,0,2} all-gather(%copy), channel_id=2, replica_groups=[1,8]<=[8], dimensions={2}
  %ar = bf16[320,320]{1,0} all-reduce(%dot), channel_id=3, to_apply=%add
  %a2a = f32[2,1,4096,8]{3,2,1,0} all-to-all(%reshape), channel_id=4, dimensions={1}
  %rs = f32[1,512]{1,0} reduce-scatter(%x), channel_id=5, dimensions={1}
  %ag-start = (f32[1,64]{1,0}, f32[8,64]{1,0}) all-gather-start(%y), channel_id=6
  %ag-done = f32[8,64]{1,0} all-gather-done(%ag-start)
  %not-a-collective = f32[4]{0} add(%a, %b)
}
"""


def test_counts_all_ops_once():
    counts = collective_counts(SAMPLE)
    # -start counts, -done (no new transfer) does not
    assert counts == {
        "collective-permute": 1,
        "all-gather": 2,
        "all-reduce": 1,
        "all-to-all": 1,
        "reduce-scatter": 1,
    }


def test_shapes_and_elements():
    inv = {op.line.split()[0]: op for op in collective_inventory(SAMPLE)}
    assert inv["%ppermute.62"].shapes == ((2, 8, 512, 64),)
    assert inv["%ppermute.62"].elements == 2 * 8 * 512 * 64
    assert inv["%ar"].shapes == ((320, 320),)
    # tuple-shaped async start: elements = the largest member
    assert inv["%ag-start"].elements == 8 * 64


def test_max_gather_elements():
    assert max_gather_elements(SAMPLE) == 2 * 8 * 4096 * 64
    assert max_gather_elements("no collectives here") == 0
