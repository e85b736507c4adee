from .writers import write_export, write_json_sidecar, write_meta_data, write_text_sidecar

__all__ = ["write_export", "write_json_sidecar", "write_meta_data", "write_text_sidecar"]
