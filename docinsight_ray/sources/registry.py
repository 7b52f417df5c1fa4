"""Source registry: format string → Dataset factory.

The engine's replacement for the reference's loader registry
(/root/reference/ingestion/pipeline_ingest.py:182-191 —
``register_loader(type, cls)``): a format keyword maps to a
``ray.data.read_*`` factory; custom sources register a callable
``(path, **kwargs) -> Dataset``. The ``synthetic`` source materializes
the deterministic fixture corpus (FIXTURES.md §1) so pipelines can be
pointed at generated data with the same API.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import ray.data

SourceFactory = Callable[..., "ray.data.Dataset"]

_REGISTRY: dict[str, SourceFactory] = {}


def register_source(fmt: str, factory: SourceFactory) -> None:
    _REGISTRY[fmt] = factory


def open_source(fmt: str, path: str, **kwargs: Any) -> "ray.data.Dataset":
    try:
        factory = _REGISTRY[fmt]
    except KeyError:
        raise ValueError(f"unknown source format {fmt!r}; known: {sorted(_REGISTRY)}") from None
    return factory(path, **kwargs)


def _synthetic_source(path: str, n_docs: int = 1000, seed: int = 42, **kw) -> "ray.data.Dataset":
    from ..fixtures import gen_corpus

    return ray.data.from_arrow(gen_corpus(n_docs, seed=seed, **kw))


register_source("parquet", lambda p, **kw: ray.data.read_parquet(p, **kw))
register_source("json", lambda p, **kw: ray.data.read_json(p, **kw))
register_source("csv", lambda p, **kw: ray.data.read_csv(p, **kw))
register_source("text", lambda p, **kw: ray.data.read_text(p, **kw))
register_source("synthetic", _synthetic_source)
