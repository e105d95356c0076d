from .deform_attn import fused_deform_attention, deform_attention_reference

__all__ = ["fused_deform_attention", "deform_attention_reference"]
