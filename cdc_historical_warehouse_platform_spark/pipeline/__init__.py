"""Pipeline orchestration: extractor, loader, state, metadata, simulator."""
