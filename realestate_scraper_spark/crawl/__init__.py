"""Crawl engine: frontier, URL-seen dedup, politeness, fetch/parse rounds,
checkpoint/resume — the Spark-native replacement for the reference's
sequential discover/detail/photos pipelines.
"""
