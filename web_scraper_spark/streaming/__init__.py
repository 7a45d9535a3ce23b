"""Structured Streaming operators (SURVEY.md §2.9 ST1-ST8).

The reference's streaming is a 3-hour cron of batch scripts; the engine
exposes the same semantics as real incremental computation:

- windows.stream_slot_counts — ST1 tumbling 3-hour windows + watermark
  over a file stream, Trigger.AvailableNow (the cron-slot analogue).
- windows.stream_dedup — ST3 stateful cross-batch dedup (dropDuplicates
  on the event key over the stream).
- sessionize — ST-state custom operator: applyInPandasWithState
  sessionization, with the batch (window-function) twin used as its
  correctness oracle.
"""
