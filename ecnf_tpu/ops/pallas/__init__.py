from ecnf_tpu.ops.pallas.egcl_kernel import (
    egcl_fused,
    egnn_forward_fused,
    flat_egnn_apply_fused,
)
