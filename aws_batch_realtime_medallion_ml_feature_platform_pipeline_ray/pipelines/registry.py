"""Merged query registry: every implemented operator exposed through
``__ray_entry__.queries()`` / ``oracle_sql()``."""

from __future__ import annotations


def full_registry() -> dict[str, tuple]:
    from . import queries, queries_relational

    reg: dict[str, tuple] = {}
    reg.update(queries.REGISTRY)
    reg.update(queries_relational.REGISTRY)
    try:
        from . import queries_text

        reg.update(queries_text.REGISTRY)
    except ImportError:
        pass
    try:
        from . import queries_ann

        reg.update(queries_ann.REGISTRY)
    except ImportError:
        pass
    from . import queries_extra

    reg.update(queries_extra.REGISTRY)
    from . import queries_curation

    reg.update(queries_curation.REGISTRY)
    from . import queries_curation2

    reg.update(queries_curation2.REGISTRY)
    from . import queries_sketch

    reg.update(queries_sketch.REGISTRY)
    from . import queries_media

    reg.update(queries_media.REGISTRY)
    from . import queries_features

    reg.update(queries_features.REGISTRY)
    from . import queries_behavior

    reg.update(queries_behavior.REGISTRY)
    from . import queries_medallion

    reg.update(queries_medallion.build_registry())
    from . import queries_temporal

    reg.update(queries_temporal.REGISTRY)
    from . import queries_signals

    reg.update(queries_signals.REGISTRY)
    from . import queries_eval

    reg.update(queries_eval.REGISTRY)
    from . import queries_sessions

    reg.update(queries_sessions.REGISTRY)
    from . import queries_sequence

    reg.update(queries_sequence.REGISTRY)
    from . import queries_timeline

    reg.update(queries_timeline.REGISTRY)
    from . import queries_r2f

    reg.update(queries_r2f.REGISTRY)
    from . import queries_r2g

    reg.update(queries_r2g.REGISTRY)
    from . import queries_r2h

    reg.update(queries_r2h.REGISTRY)
    from . import queries_r2i

    reg.update(queries_r2i.REGISTRY)
    from . import queries_r2j

    reg.update(queries_r2j.REGISTRY)
    from . import queries_r2k

    reg.update(queries_r2k.REGISTRY)
    from . import queries_r2l

    reg.update(queries_r2l.REGISTRY)
    from . import queries_r2m

    reg.update(queries_r2m.REGISTRY)
    from . import queries_r2n

    reg.update(queries_r2n.REGISTRY)
    from . import queries_r3a

    reg.update(queries_r3a.REGISTRY)
    from . import queries_r3b

    reg.update(queries_r3b.REGISTRY)
    from . import queries_r3c

    reg.update(queries_r3c.REGISTRY)
    from . import queries_r3d

    reg.update(queries_r3d.REGISTRY)
    from . import queries_r3e

    reg.update(queries_r3e.REGISTRY)
    from . import queries_r3f

    reg.update(queries_r3f.REGISTRY)
    from . import queries_r4a

    reg.update(queries_r4a.REGISTRY)
    from . import queries_r4b

    reg.update(queries_r4b.REGISTRY)
    from . import queries_r4c

    reg.update(queries_r4c.REGISTRY)
    from . import queries_r4d

    reg.update(queries_r4d.REGISTRY)
    from . import queries_r4e

    reg.update(queries_r4e.REGISTRY)
    from . import queries_r4f

    reg.update(queries_r4f.REGISTRY)
    from . import queries_r5a

    reg.update(queries_r5a.REGISTRY)
    from . import queries_r5b

    reg.update(queries_r5b.REGISTRY)
    from . import queries_r5c

    reg.update(queries_r5c.REGISTRY)
    from . import queries_r5d

    reg.update(queries_r5d.REGISTRY)
    from . import queries_r5e

    reg.update(queries_r5e.REGISTRY)
    from . import queries_r5f

    reg.update(queries_r5f.REGISTRY)
    from . import queries_r5g

    reg.update(queries_r5g.REGISTRY)
    from . import queries_r5h

    reg.update(queries_r5h.REGISTRY)
    return reg
