from .pipeline import UnloadJob, build_views_for_tables, run_unload

__all__ = ["UnloadJob", "build_views_for_tables", "run_unload"]
