"""Structured Streaming surface — intentionally empty.

The reference (GeoPandas) is a batch-only library with no streaming
semantics to reproduce (SURVEY.md §1.3), so this engine exposes none.
The operators remain streaming-compatible where Spark allows it: every
st_* function is a stateless projection usable on a streaming DataFrame
as-is; the joins/aggregations would need watermark policies that the
reference does not define. This module exists to document that decision
rather than leave an ambiguous gap.
"""
