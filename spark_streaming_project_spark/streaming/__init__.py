from .runner import StreamRunner, stream_parquet_dir, stream_json_dir
from .sinks import (
    foreach_batch_cc_update,
    foreach_batch_dq_gate,
    foreach_batch_jdbc_append,
    foreach_batch_incremental_agg,
    foreach_batch_kcenter_update,
    foreach_batch_jdbc_idempotent_append,
    foreach_batch_jdbc_overwrite,
    foreach_batch_per_batch_topk,
)
from .sources import kafka_stream

__all__ = [
    "StreamRunner",
    "foreach_batch_cc_update",
    "stream_parquet_dir",
    "stream_json_dir",
    "kafka_stream",
    "foreach_batch_dq_gate",
    "foreach_batch_jdbc_append",
    "foreach_batch_incremental_agg",
    "foreach_batch_kcenter_update",
    "foreach_batch_jdbc_idempotent_append",
    "foreach_batch_jdbc_overwrite",
    "foreach_batch_per_batch_topk",
]
