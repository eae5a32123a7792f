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
