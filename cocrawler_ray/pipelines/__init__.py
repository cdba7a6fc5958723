"""End-to-end pipelines (crawl generation loop, resume)."""
