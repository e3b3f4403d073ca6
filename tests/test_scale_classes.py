"""Every registry query must carry a valid scale_class tag, and the
generated doc table must be in sync (VERDICT r3 §next-6)."""

import os


def test_every_query_tagged(ray_session):
    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.registry import (
        full_registry,
    )
    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.scale import (
        CLASSES,
        SCALE_CLASS,
        SCALE_PATH,
    )

    reg = set(full_registry())
    tagged = set(SCALE_CLASS)
    assert reg - tagged == set(), f"untagged queries: {sorted(reg - tagged)}"
    assert tagged - reg == set(), f"stale tags: {sorted(tagged - reg)}"
    bad = {n: c for n, c in SCALE_CLASS.items() if c not in CLASSES}
    assert not bad
    # every exact-baseline names its scale path
    missing_path = [
        n for n, c in SCALE_CLASS.items()
        if c == "exact-baseline" and n not in SCALE_PATH
    ]
    assert not missing_path, missing_path


def test_doc_table_in_sync(ray_session):
    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.scale import (
        render_doc,
    )

    doc = os.path.join(os.path.dirname(__file__), "..", "docs",
                       "SCALE_CLASSES.md")
    with open(doc) as f:
        assert f.read() == render_doc()


def test_entry_surface(ray_session):
    import __ray_entry__ as E

    sc = E.scale_classes()
    assert len(sc) >= 285 and all(isinstance(v, str) for v in sc.values())
