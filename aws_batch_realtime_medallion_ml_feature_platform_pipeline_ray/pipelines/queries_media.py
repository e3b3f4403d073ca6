"""Multimodal query entries: metadata projection (oracle-backed) and the
actor-pool decode/feature stage (rows-only — payload checksums are not
SQL-expressible; pytest covers them against a pure-Python reference)."""

from __future__ import annotations

from ..stages.multimodal import (
    MEDIA_META_SQL,
    MEDIA_RESIZE_SQL,
    media_meta_pipeline,
    media_pipeline,
    media_resize_pipeline,
)

REGISTRY: dict[str, tuple] = {
    "media_meta": (media_meta_pipeline, MEDIA_META_SQL),
    "media_decode": (lambda sf_dir: media_pipeline(sf_dir), None),
    "media_resize": (lambda sf_dir: media_resize_pipeline(sf_dir), MEDIA_RESIZE_SQL),
}
