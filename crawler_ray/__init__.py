"""crawler_ray — a Ray-Data-native crawl-and-quality-filter engine.

A from-scratch rebuild of the capabilities of the reference system
(``eyjs/crawler``, studied read-only at ``/root/reference``): a BFS web
crawler with knowledge-base feedback, interleaved text+media document
extraction, multi-stage content-quality filtering, and exact/approximate
deduplication — re-expressed on ``ray.data.Dataset`` pipelines with
actor-pool stateful stages and a sharded URL-frontier service.

Layout
------
``functions/``  pure, picklable operator kernels (cleaners, predicates,
                URL algebra, hashing, span ops) — used inside
                ``map_batches`` bodies and unit-tested directly.
``sources/``    readers/writers (parquet always; Lance when available)
                and the deterministic synthetic-web generator.
``stages/``     ``map_batches`` stage callables: stateless parse fns and
                stateful actor classes (fetcher, scorer, dedup, ANN).
``state/``      the frontier service: Bloom/cuckoo filters, politeness,
                robots cache, sharded frontier actors, checkpointing.
``pipelines/``  end-to-end drivers: wave-synchronous crawl loop,
                quality-filter pipeline, flagship document pipeline.
``conformance/`` a faithful reimplementation of the reference BFS used
                as the golden-trace oracle (SURVEY.md §3.4).
"""

__version__ = "0.1.0"


def _shim_fsspec_http() -> None:
    """Environment workaround: fsspec's http module needs aiohttp and
    raises a bare ImportError without it, which Ray Data's
    ``_is_http_filesystem`` (catching only ModuleNotFoundError) then
    propagates from read/write paths depending on import order.
    Install a sentinel module so the import always succeeds; nothing is
    ever an instance of the sentinel class, so behavior is 'not an
    http filesystem' — exactly right for this offline environment."""
    try:
        from fsspec.implementations.http import HTTPFileSystem  # noqa: F401
    except Exception:
        import sys
        import types

        mod = types.ModuleType("fsspec.implementations.http")

        class HTTPFileSystem:  # sentinel only
            pass

        mod.HTTPFileSystem = HTTPFileSystem
        sys.modules["fsspec.implementations.http"] = mod


_shim_fsspec_http()
