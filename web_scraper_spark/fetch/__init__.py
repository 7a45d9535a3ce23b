"""Fetch stage implementations (SURVEY.md S3).

The round engine's fetch point is pluggable: the default resolves URLs
against the stored pages table (the sandbox/warc replay path); http.py is
the live variant — batched HTTP inside mapInPandas, the drop-in
replacement for the reference's per-URL Selenium driver.get.
"""
