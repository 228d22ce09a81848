"""Query plans.

``registry`` holds the driver-contract query registry; importing
``all_queries`` pulls in every module that registers queries.
"""

from __future__ import annotations

from .registry import REGISTRY, QuerySpec, register  # noqa: F401


def all_queries() -> dict[str, "QuerySpec"]:
    """Import every query module and return the full registry."""
    from . import (  # noqa: F401
        analytics_ext,
        approx_ext,
        composite,
        curation_ext,
        docmodel,
        geo_ext,
        iterative_ext,
        merge_queries,
        misc_ext,
        pipeline_ext,
        quality_ext,
        relational,
        sampling_ext,
        scale_ext,
        sketch_ext,
        streaming_q,
        tokenizer_ext,
        window_ext,
    )

    return dict(REGISTRY)
