from em_adapt_tpu.ops.estep import estep as estep_jax
from em_adapt_tpu.ops.estep import estep_fixed, make_class_orders
from em_adapt_tpu.ops.estep_oracle import estep_oracle
from em_adapt_tpu.ops.pooling import max_pool_same
from em_adapt_tpu.ops.resize import resize_bilinear_tf, resize_nearest_tf

__all__ = [
    "estep_jax",
    "estep_oracle",
    "make_class_orders",
    "max_pool_same",
    "resize_bilinear_tf",
    "resize_nearest_tf",
]
