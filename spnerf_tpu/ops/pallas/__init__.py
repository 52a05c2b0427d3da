from .field_eval import fused_field_apply, supports_config

__all__ = ["fused_field_apply", "supports_config"]
