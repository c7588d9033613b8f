"""Roofline HLO parser (tools/roofline.py): conv/dot extraction and the
implicit-GEMM dimension mapping, pinned on hand-crafted optimized-HLO text."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from roofline import _ceil_pad_eff, parse_matmul_ops  # noqa: E402

HLO = """
HloModule jit_step

%fused_computation {
  %p0 = bf16[16,155,155,48]{3,2,1,0:T(8,128)(2,1)} parameter(0)
  ROOT %out.1 = bf16[16,155,155,48]{3,2,1,0} add(%p0, %p0)
}

ENTRY %main {
  %x = bf16[16,155,155,48]{3,2,1,0:T(8,128)(2,1)} parameter(0)
  %w = bf16[3,3,48,48]{3,2,1,0:T(8,128)(2,1)} parameter(1)
  %conv.1 = bf16[16,155,155,48]{3,2,1,0:T(8,128)(2,1)} convolution(%x, %w), window={size=3x3 pad=1_1x1_1}, dim_labels=b01f_01io->b01f, metadata={op_name="fwd"}
  %a = bf16[4,720]{1,0} parameter(2)
  %b = bf16[720,8]{1,0} parameter(3)
  %dot.1 = bf16[4,8]{1,0} dot(%a, %b), lhs_contracting_dims={1}, rhs_contracting_dims={0}
  ROOT %t = tuple(%conv.1, %dot.1)
}
"""


class TestParser:
    def test_conv_gemm_dims(self):
        ops = [o for o in parse_matmul_ops(HLO) if o["kind"] == "conv"]
        assert len(ops) == 1
        (c,) = ops
        # implicit GEMM: M = B*H*W, N = C_out, K = kh*kw*C_in
        assert c["M"] == 16 * 155 * 155
        assert c["N"] == 48
        assert c["K"] == 3 * 3 * 48
        assert c["flops"] == 2.0 * c["M"] * c["N"] * c["K"]
        # bytes: in + out (same shape) + kernel, all bf16
        expect = 2 * (2 * 16 * 155 * 155 * 48 + 3 * 3 * 48 * 48)
        assert c["bytes"] == expect

    def test_dot_gemm_dims(self):
        ops = [o for o in parse_matmul_ops(HLO) if o["kind"] == "dot"]
        assert len(ops) == 1
        (d,) = ops
        assert (d["M"], d["N"], d["K"]) == (4, 8, 720)

    def test_transposed_wgrad_labels(self):
        # backward weight-grad conv: output IS the kernel, labels permuted
        hlo = """
ENTRY %m {
  %g = bf16[155,155,16,48]{3,2,1,0} parameter(0)
  %x = bf16[48,157,157,16]{3,2,1,0} parameter(1)
  %wg = bf16[3,3,48,48]{3,2,1,0} convolution(%x, %g), window={size=155x155 pad=1_1x1_1}, dim_labels=f01b_01bo->01io
}
"""
        ops = parse_matmul_ops(hlo)
        assert len(ops) == 1
        (c,) = ops
        # out has no 'f' label -> N=1 fallback; flops still 2*prod(out)*K
        # with K = window * rhs_i-or-1; exactness matters only for buckets,
        # the invariant is flops > 0 and bytes cover all three tensors
        assert c["flops"] > 0
        assert c["bytes"] > 0

    def test_pad_eff(self):
        assert _ceil_pad_eff(128) == 1.0
        assert _ceil_pad_eff(48) == 48 / 128
        assert _ceil_pad_eff(432) == 432 / 512
        assert _ceil_pad_eff(720) == 720 / 768
