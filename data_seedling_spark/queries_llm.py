"""LLM-data-pipeline query registrations (dedup, similarity, text
analysis, multimodal). Populated in Phase 4; importing this module
registers entries into ``queries._REGISTRY``."""

from __future__ import annotations
