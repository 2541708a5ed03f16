from .deid import build_deid_pipeline, run_deid_job

__all__ = ["build_deid_pipeline", "run_deid_job"]
