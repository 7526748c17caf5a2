from chexpert_tpu.ops.attention import (
    aa_attention_einsum,
    rel_to_abs,
    relative_logits,
    relative_logits_compact,
)
from chexpert_tpu.ops.pallas_attention import aa_attention_pallas

__all__ = [
    "aa_attention_einsum",
    "rel_to_abs",
    "relative_logits",
    "relative_logits_compact",
    "aa_attention_pallas",
]
