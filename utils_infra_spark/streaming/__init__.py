from .upsert import keyed_upsert_batch, keyed_upsert_stream, merge_group

__all__ = ["keyed_upsert_batch", "keyed_upsert_stream", "merge_group"]
