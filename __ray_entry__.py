"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship gold-feature pipeline on sf0.001;
``queries()`` exposes one callable per implemented operator/pipeline from
SURVEY.md §2; ``oracle_sql()`` gives each a DuckDB twin where the op is
SQL-expressible (value-hash parity), else the driver records a rows-only
check.

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: events → transcript
    derivation → one hash shuffle by conv_id → fused vectorized gold pass
    (dedup + lag/lead + sessionization + rolling RANGE windows incl. exact
    sliding distinct count)."""
    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.queries import (
        q_gold_features,
    )

    return q_gold_features("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.registry import (
        full_registry,
    )

    return {name: fn for name, (fn, _sql) in full_registry().items()}


def oracle_sql() -> dict[str, str]:
    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.registry import (
        full_registry,
    )

    return {
        name: sql for name, (_fn, sql) in full_registry().items() if sql is not None
    }


def scale_classes() -> dict[str, str]:
    """Machine-readable scale contract per queries() entry (see
    pipelines/scale.py for the class definitions and docs/SCALE_CLASSES.md
    for the generated table)."""
    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.scale import (
        scale_classes as _sc,
    )

    return _sc()
