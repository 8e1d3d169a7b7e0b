"""Structured Streaming surface (SURVEY.md §2.9).

``transforms`` holds the shared event-time logic — each transformation is
written once against a DataFrame and works unchanged on a batch scan or
a ``readStream`` source, which is what makes the batch twins in
``queries/streaming_batch.py`` faithful oracles for the streaming path.
``runner`` executes true streams (availableNow trigger, memory /
foreachBatch sinks, checkpoints).
"""

from .runner import (  # noqa: F401
    pin_feed_mtimes,
    read_documents_stream,
    read_events_stream,
    run_available_now,
    scratch_dir,
)
from . import transforms  # noqa: F401
