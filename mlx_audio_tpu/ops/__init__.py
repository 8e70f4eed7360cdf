from .attention import scaled_dot_product_attention, sdpa
from .rope import apply_rope, rope_cos_sin
