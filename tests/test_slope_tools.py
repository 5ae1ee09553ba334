"""tools/slope_trace.py HLO histogram parser (round-5 pool-slope work)."""

from takzero_tpu.tools.slope_trace import op_shape_histogram

SAMPLE = """
ENTRY %main.1 (p0: f32[8,1545,256]) -> f32[8,1545,256] {
  %p0 = f32[8,1545,256]{2,0,1:T(8,128)} parameter(0)
  %copy.1 = f32[8,1545,256]{2,1,0} copy(%p0)
  %fusion.9 = f32[8,1545,256]{2,0,1:T(8,128)} fusion(%copy.1), kind=kCustom
  ROOT %add.2 = f32[8,1545,256]{2,1,0} add(%fusion.9, %copy.1)
}
"""


def test_op_shape_histogram_counts_ops_with_shapes():
    h = op_shape_histogram(SAMPLE)
    assert h[("copy", "f32[8,1545,256]{2,1,0}")] == 1
    assert h[("fusion", "f32[8,1545,256]{2,0,1:T(8,128)}")] == 1
    assert h[("add", "f32[8,1545,256]{2,1,0}")] == 1
    assert h[("parameter", "f32[8,1545,256]{2,0,1:T(8,128)}")] == 1
