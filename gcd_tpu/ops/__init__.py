from gcd_tpu.ops.attention import dot_product_attention
from gcd_tpu.ops.basic import timestep_embedding
