"""Pseudonymisation / feature-extraction / CDC query registrations.
Populated in Phases 2–3; importing this module registers entries into
``queries._REGISTRY``."""

from __future__ import annotations
