from .deid import DEID_OUTPUT_SCHEMA, make_deid_batch_fn, add_pid

__all__ = ["DEID_OUTPUT_SCHEMA", "make_deid_batch_fn", "add_pid"]
