"""Structured Streaming surface (SURVEY.md §2.9).

The crawl itself runs rounds-as-batch-jobs (the idiomatic fit for frontier
expansion — see crawl/engine.py), but the engine also exposes true
Structured Streaming pipelines for the continuous-ingest side of the
reference's `live` mode (scrapper/pipelines/stream.py): offers arriving as
files/events → windowed aggregation with watermarks → sink.
"""
