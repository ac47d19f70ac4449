"""Structured Streaming slice (SURVEY.md §2b 'Streaming: absent in
reference') — event-time windows, watermarks, session windows and
custom stateful processing over the ``events`` table, executed with
``Trigger.AvailableNow`` so every streaming query is a deterministic,
batch-equivalent computation the correctness gate can check."""
