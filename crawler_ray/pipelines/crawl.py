"""Wave-synchronous distributed crawl engine on Ray Data.

Architecture (SURVEY.md §7):

    frontier shards (actors, host-hash-partitioned)
        │ plan_wave()            ← FIFO + KB dequeue filters + politeness
        ▼
    wave Dataset  = from_arrow(control rows, pre-split into blocks)
        → map_batches(Fetcher, actor pool, web broadcast via ray.put)
        → map_batches(parse_batch)              stateless tasks
        → map_batches(AttachmentEnricher, pool) spans + content hash
        → [map_batches(FeedbackScorer, pool)]   optional KB feedback
        → materialize()                          (bounded: one wave)
        ├─ write_parquet(output/wave=K)          resumable page sink
        └─ control columns → ingest_results()    ordered enqueue

Determinism: every wave row carries ``(site, dispatch_index)``; results
are re-sorted to dispatch order before ``ingest_results``, so frontier
evolution is bit-for-bit the reference BFS order regardless of task
scheduling (SURVEY.md §3.4).  Within-wave parallelism is the only
parallelism the ordering contract allows across one site; throughput
scaling comes from many hosts per wave.

Scale notes: the wave is the unit of memory (politeness-budgeted);
pages stream to partitioned parquet per wave (Lance when available);
the synthetic web is broadcast once (``ray.put``) and read per actor.
Checkpoint = per-shard state blob + manifest, written atomically per
wave; resume skips completed waves.
"""

from __future__ import annotations

import json
import os
import time

import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data

from crawler_ray.functions.spans import has_media_failure, render_main_text
from crawler_ray.stages.fetch import CrawlWaveStage, crawl_wave_stateless
from crawler_ray.stages.scoring import mock_analyze, mock_gate
from crawler_ray.functions.textops import is_low_quality_text
from crawler_ray.state.frontier import CrawlProfile, FrontierShard, shard_of


class _RobotsFetch:
    """Picklable robots.txt fetcher over the (synthetic) web."""

    def __init__(self, web):
        self.web = web

    def __call__(self, robots_url: str) -> str | None:
        status, _ctype, body = self.web.fetch(robots_url)
        return body if status == 200 else None


class FeedbackScorer:
    """Actor-pool stage computing the worker's KB feedback score per
    page (mock LLM; -1 = parse-failure feedback)."""

    def __init__(self, prompts_by_site: dict[str, str]):
        self.prompts = prompts_by_site

    def __call__(self, batch: pa.Table) -> pa.Table:
        spans_col = batch["spans"].to_pylist()
        urls = batch["url"].to_pylist()
        sites = batch["site"].to_pylist()
        oks = batch["ok"].to_pylist()
        scores = []
        for ok, url, site, spans in zip(oks, urls, sites, spans_col):
            if not ok or not spans:
                scores.append(None)
                continue
            prompt = self.prompts.get(site, "")
            if has_media_failure(spans):
                scores.append(-1.0)
                continue
            text = render_main_text(spans)
            if is_low_quality_text(text) or not mock_gate(text, prompt):
                scores.append(0.0)
            else:
                scores.append(mock_analyze(text, url, prompt)["relevance_score"])
        return batch.append_column("fb_score", pa.array(scores, type=pa.float64()))


class CrawlEngine:
    def __init__(
        self,
        web,
        seeds: list[dict],
        num_shards: int = 2,
        profile: str = "hp",
        route_attachments: bool = True,
        robots_enabled: bool = False,
        feedback: bool = False,
        output_dir: str | None = None,
        checkpoint_dir: str | None = None,
        fetch_concurrency: int = 4,
        fetch_batch_size: int = 64,
        wave_horizon: float = 0.0,
        bloom_capacity: int = 1 << 17,
        stateless_fetch: bool = True,
        task_fanout: bool = True,
        wall_clock_politeness: bool = False,
    ):
        self.web = web
        self.seeds = seeds
        self.num_shards = num_shards
        self.profile_state = (
            CrawlProfile.fast() if profile == "fast" else CrawlProfile.hp()
        ).state()
        self.route_attachments = route_attachments
        self.link_cap = 50 if profile == "fast" else None
        self.feedback = feedback
        self.prompts = {
            s["site_identifier"]: s.get("instruction_prompt", "") for s in seeds
        }
        self.output_dir = output_dir
        self.checkpoint_dir = checkpoint_dir
        self.fetch_concurrency = fetch_concurrency
        self.fetch_batch_size = fetch_batch_size
        self.wave_horizon = wave_horizon
        self.stateless_fetch = stateless_fetch
        self.task_fanout = task_fanout
        self._prompts_ref = None
        self.metrics: list[dict] = []
        self.wave = 0
        self.totals = {"dispatched": 0, "saved": 0, "filtered": 0}

        self.shards = [
            FrontierShard.remote(
                shard_id=i,
                bloom_capacity=bloom_capacity,
                robots_enabled=robots_enabled,
                robots_fetch=_RobotsFetch(web) if robots_enabled else None,
                wall_clock_politeness=wall_clock_politeness,
            )
            for i in range(num_shards)
        ]
        self._site_shard: dict[str, int] = {}
        for seed in seeds:
            host = seed["base_url"].split("/")[2]
            idx = shard_of(host, num_shards)
            self._site_shard[seed["site_identifier"]] = idx
            ray.get(
                self.shards[idx].add_site.remote(seed, self.profile_state)
            )

    # ------------------------------------------------------------------
    def _wave_dataset(
        self, rows: list[dict], parallelism: int | None = None, wave: int | None = None
    ):
        return _build_wave_dataset(
            rows,
            self.wave if wave is None else wave,
            self.fetch_batch_size,
            parallelism or self.fetch_concurrency,
        )

    def run_wave(self, web_ref) -> bool:
        """Plan + execute one wave; False when the crawl is complete."""
        t0 = time.perf_counter()
        t_plan = time.time()
        plans = ray.get(
            [s.plan_wave.remote(self.wave_horizon) for s in self.shards]
        )
        rows = [r for plan in plans for r in plan]
        if not rows:
            return False

        ctrl_cols_early = [
            "site", "url", "dispatch_index", "ok", "content_sha256", "page_links",
        ]
        if self.feedback:
            ctrl_cols_early.append("fb_score")
        if self.task_fanout and self.stateless_fetch and not self.output_dir:
            # no page sink → the wave is pure fetch+filter+ingest; run it
            # as a bounded task fan-out (see _wave_block_task rationale)
            if self.feedback and self._prompts_ref is None:
                self._prompts_ref = ray.put(self.prompts)
            block_refs = _submit_wave_tasks(
                rows, self.wave, self.fetch_batch_size, self.fetch_concurrency,
                web_ref, self.route_attachments, self.link_cap,
                self._prompts_ref if self.feedback else None, ctrl_cols_early,
            )
            return self._finish_wave(rows, block_refs, t0, t_plan)

        ds = self._wave_dataset(rows)
        if self.stateless_fetch:
            # stateless tasks + worker-global web cache: no per-wave
            # actor-pool startup (workers are long-lived across waves)
            ds = ds.map_batches(
                crawl_wave_stateless,
                fn_args=(web_ref, self.route_attachments, self.link_cap),
                batch_size=None,  # whole input block per task (no coalescing)
                batch_format="pyarrow",
            )
        else:
            ds = ds.map_batches(
                CrawlWaveStage,
                fn_constructor_args=(web_ref, self.route_attachments, self.link_cap),
                concurrency=self.fetch_concurrency,
                batch_size=self.fetch_batch_size,
                batch_format="pyarrow",
                num_cpus=1,
            )
        if self.feedback:
            if self.stateless_fetch:
                prompts = self.prompts

                def fb(batch: pa.Table) -> pa.Table:
                    return FeedbackScorer(prompts)(batch)

                ds = ds.map_batches(
                    fb, batch_size=self.fetch_batch_size, batch_format="pyarrow"
                )
            else:
                ds = ds.map_batches(
                    FeedbackScorer,
                    fn_constructor_args=(self.prompts,),
                    concurrency=self.fetch_concurrency,
                    batch_size=self.fetch_batch_size,
                    batch_format="pyarrow",
                    num_cpus=1,
                )
        ctrl_cols = ["site", "url", "dispatch_index", "ok", "content_sha256", "page_links"]
        if self.feedback:
            ctrl_cols.append("fb_score")

        if self.output_dir:
            # page sink needed → pin the wave once, then write + project
            mat = ds.materialize()
            # hive-style wave=K partition dirs (the dir name carries the
            # wave column; a resumed run skips completed partitions)
            wave_dir = os.path.join(self.output_dir, f"wave={self.wave:05d}")
            mat.drop_columns(["page_links", "wave", "failed_attachments"]).write_parquet(
                wave_dir
            )
            self._sink_failed_attachments(mat, f"wave={self.wave:05d}")
            block_refs = mat.select_columns(ctrl_cols).to_arrow_refs()
        else:
            # no page sink → ONE streaming execution per wave; project the
            # control columns INSIDE the map stage (a select_columns here
            # would trigger a schema-inference pre-execution of the whole
            # fused map on one block — i.e. a second run), and the control
            # blocks stay in the object store for the shards to ingest
            # zero-copy in parallel (spans/text never reach the driver)
            ds = ds.map_batches(
                lambda t, cols=tuple(ctrl_cols): t.select(list(cols)),
                batch_format="pyarrow",
            )
            # ONE execution: collect the block refs straight from the ref
            # bundles (to_arrow_refs' trailing schema fetch would re-run
            # the plan for a limit-1 pass; our blocks are already Arrow)
            block_refs = [
                ref for bundle in ds.iter_internal_ref_bundles() for ref in bundle.block_refs
            ]

        return self._finish_wave(rows, block_refs, t0, t_plan)

    def _finish_wave(
        self, rows: list[dict], block_refs: list, t0: float, t_plan: float
    ) -> bool:
        ingests = ray.get(
            [s.ingest_wave.remote(block_refs, self.feedback) for s in self.shards]
        )
        n_saved = sum(o["saved"] for o in ingests)
        n_ok = sum(o["ok"] for o in ingests)

        self.totals["dispatched"] += len(rows)
        self.totals["saved"] += n_saved
        self.totals["filtered"] += len(rows) - n_ok
        self.metrics.append(
            {
                "wave": self.wave,
                "partition": -1,
                "fetched": len(rows),
                "parsed": n_ok,
                "filtered": len(rows) - n_ok,
                "accepted": n_saved,
                "wall_s": time.perf_counter() - t0,
                "t_plan": t_plan,
            }
        )
        # checkpoint AFTER totals/metrics include this wave: restore()
        # adopts the manifest totals, so checkpointing first would make a
        # resumed run permanently under-report the just-completed wave
        if self.checkpoint_dir:
            self._checkpoint()
        self.wave += 1
        return True

    # -- per-shard parallel wave loops --------------------------------
    def _shard_cfg(self) -> dict:
        if self.feedback and self.task_fanout and self._prompts_ref is None:
            self._prompts_ref = ray.put(self.prompts)
        return {
            "wave_horizon": self.wave_horizon,
            "fetch_concurrency": self.fetch_concurrency,
            "fetch_batch_size": self.fetch_batch_size,
            "num_shards": self.num_shards,
            "route_attachments": self.route_attachments,
            "link_cap": self.link_cap,
            "feedback": self.feedback,
            "prompts": self.prompts,
            # inside a dict, Ray does NOT auto-deref the ref — exactly
            # what the task-fanout path wants (workers cache on the ref)
            "prompts_ref": self._prompts_ref,
            "task_fanout": self.task_fanout and self.stateless_fetch,
            "output_dir": self.output_dir,
            "checkpoint_dir": self.checkpoint_dir,
        }

    def _checkpoint_shard(self, shard_idx: int, wave: int) -> None:
        _checkpoint_shard_blob(
            self.shards[shard_idx], shard_idx, wave, self.checkpoint_dir
        )

    def restore_parallel(self) -> dict[int, int]:
        """Restore each shard from its own latest per-wave checkpoint;
        returns {shard_idx: next_wave}.  Page partitions written after a
        shard's restored wave are pruned (they will be rewritten)."""
        import shutil

        next_waves: dict[int, int] = {}
        for i, shard in enumerate(self.shards):
            shard_dir = os.path.join(self.checkpoint_dir, f"shard_{i}")
            waves = (
                sorted(
                    f
                    for f in os.listdir(shard_dir)
                    if f.startswith("wave_") and f.endswith(".pkl")
                )
                if os.path.isdir(shard_dir)
                else []
            )
            if not waves:
                next_waves[i] = 0
                continue
            last = waves[-1]
            with open(os.path.join(shard_dir, last), "rb") as f:
                ray.get(shard.restore_blob.remote(f.read()))
            done_wave = int(last[len("wave_") : -len(".pkl")])
            next_waves[i] = done_wave + 1
            if self.output_dir:
                # prune BOTH the page partitions and the matching
                # forensics partitions past the restored wave — a re-run
                # wave would otherwise append fresh parquet next to the
                # stale files and duplicate rows
                for root in (
                    self.output_dir,
                    f"{self.output_dir}_failed_attachments",
                ):
                    sdir = os.path.join(root, f"shard={i}")
                    if not os.path.isdir(sdir):
                        continue
                    for d in os.listdir(sdir):
                        if d.startswith("wave=") and int(d.split("=")[1]) > done_wave:
                            shutil.rmtree(os.path.join(sdir, d))
        return next_waves

    def run_parallel(
        self,
        start_waves: dict[int, int] | None = None,
        use_runner_actors: bool = False,
    ) -> dict:
        """Run every shard's wave loop concurrently (driver threads).

        The wave-synchronous ordering contract is per-site, and a site
        lives on exactly one shard, so decoupling shards preserves
        conformance while letting one shard's ingest overlap another's
        fetch/parse.  Pages (if ``output_dir``) land in
        ``shard=<i>/wave=<k>`` partitions; checkpoints (if configured)
        are per shard per wave — resume via :meth:`restore_parallel`.

        Each shard's loop runs in its own supervisor ACTOR process
        (``_ShardWaveRunner``): N shards drive N independent streaming
        executors instead of N executor threads sharing the driver's
        GIL — and on a real cluster this is the per-node wave-driver
        shape (`ray job submit` starts one driver; the runners fan the
        coordination out).
        """
        web_ref = ray.put(self.web)
        starts = start_waves or {}
        cfg = self._shard_cfg()
        if use_runner_actors:
            runners = [_ShardWaveRunner.remote() for _ in range(self.num_shards)]
            futs = [
                r.run.remote(self.shards[i], i, [web_ref], cfg, starts.get(i, 0))
                for i, r in enumerate(runners)
            ]
            results = ray.get(futs)
            for r in runners:
                ray.kill(r)
        else:
            # driver-thread fallback (all executors share this process)
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=self.num_shards) as pool:
                results = list(
                    pool.map(
                        lambda i: _run_shard_waves(
                            self.shards[i], i, web_ref, cfg, starts.get(i, 0)
                        ),
                        range(self.num_shards),
                    )
                )
        for r in results:
            t = r["totals"]
            self.totals["dispatched"] += t["dispatched"]
            self.totals["saved"] += t["saved"]
            self.totals["filtered"] += t["filtered"]
            self.wave = max(self.wave, t["waves"])
            self.metrics.extend(r["metrics"])
        if self.output_dir and self.metrics:
            pq.write_table(
                pa.Table.from_pylist(sorted(self.metrics, key=lambda m: (m["partition"], m["wave"]))),
                self.output_dir.rstrip("/") + "_metrics.parquet",
            )
        return {"waves": self.wave, **self.totals}

    def run(self, max_waves: int | None = None) -> dict:
        web_ref = ray.put(self.web)
        while max_waves is None or self.wave < max_waves:
            if not self.run_wave(web_ref):
                break
        if self.output_dir and self.metrics:
            # sibling of the page table (keeps the hive dir homogeneous)
            pq.write_table(
                pa.Table.from_pylist(self.metrics),
                self.output_dir.rstrip("/") + "_metrics.parquet",
            )
        return {"waves": self.wave, **self.totals}

    # -- conformance probes -------------------------------------------
    def url_seen(self, site: str) -> list[str]:
        shard = self.shards[self._site_shard[site]]
        return ray.get(shard.url_seen.remote(site))

    def kb_table(self) -> list[dict]:
        rows = []
        for s in self.shards:
            rows.extend(ray.get(s.kb_table.remote()))
        return rows

    def ledger_table(self) -> list[dict]:
        rows = []
        for s in self.shards:
            rows.extend(ray.get(s.ledger_table.remote()))
        return rows

    # -- forensics side table ------------------------------------------
    def _sink_failed_attachments(self, mat, subdir: str) -> None:
        _sink_failed_attachments_to(mat, self.output_dir, subdir)

    # -- checkpoint / resume -------------------------------------------
    def _checkpoint(self) -> None:
        blobs = ray.get([s.checkpoint_blob.remote() for s in self.shards])
        tmp = os.path.join(self.checkpoint_dir, f".tmp_wave_{self.wave:05d}")
        final = os.path.join(self.checkpoint_dir, f"wave_{self.wave:05d}")
        os.makedirs(tmp, exist_ok=True)
        for i, blob in enumerate(blobs):
            with open(os.path.join(tmp, f"shard_{i}.pkl"), "wb") as f:
                f.write(blob)
        with open(os.path.join(tmp, "manifest.json"), "w") as f:
            json.dump(
                {
                    "wave": self.wave,
                    "num_shards": self.num_shards,
                    "totals": self.totals,
                },
                f,
            )
        # a re-run wave after restoring an older-than-latest checkpoint
        # leaves the old dir behind; os.replace on a non-empty dir raises
        # ENOTEMPTY.  Crash-safe swap: move the old dir ASIDE (atomic
        # rename), install the new one (atomic rename), then delete the
        # old — a crash between the renames leaves either the previous
        # or the new checkpoint fully intact, never a half-written one
        # (latest_checkpoint ignores the aside dir: its ``.old_`` prefix
        # fails the ``wave_`` name match).
        import shutil

        old = os.path.join(self.checkpoint_dir, f".old_wave_{self.wave:05d}")
        shutil.rmtree(old, ignore_errors=True)
        if os.path.isdir(final):
            os.replace(final, old)
        os.replace(tmp, final)
        shutil.rmtree(old, ignore_errors=True)

    @staticmethod
    def latest_checkpoint(checkpoint_dir: str) -> str | None:
        if not os.path.isdir(checkpoint_dir):
            return None
        waves = sorted(
            d
            for d in os.listdir(checkpoint_dir)
            if d.startswith("wave_")
            and os.path.exists(os.path.join(checkpoint_dir, d, "manifest.json"))
        )
        return os.path.join(checkpoint_dir, waves[-1]) if waves else None

    def restore(self, ckpt_path: str) -> int:
        """Restore shard states from a checkpoint; returns next wave."""
        with open(os.path.join(ckpt_path, "manifest.json")) as f:
            manifest = json.load(f)
        assert manifest["num_shards"] == self.num_shards
        futures = []
        for i, shard in enumerate(self.shards):
            with open(os.path.join(ckpt_path, f"shard_{i}.pkl"), "rb") as f:
                futures.append(shard.restore_blob.remote(f.read()))
        ray.get(futures)
        self.wave = manifest["wave"] + 1
        self.totals = dict(manifest["totals"])
        # prune stale LATER checkpoints from the abandoned run: we are
        # about to delete those waves' page output, so leaving their
        # checkpoint dirs behind would make the NEXT latest_checkpoint()
        # resume jump past waves whose output no longer exists
        # (permanent gaps in the page sink)
        ckpt_root = os.path.dirname(os.path.abspath(ckpt_path))
        if os.path.isdir(ckpt_root):
            import shutil

            for d in os.listdir(ckpt_root):
                if d.startswith("wave_") and int(d.split("_")[1]) > manifest["wave"]:
                    shutil.rmtree(os.path.join(ckpt_root, d))
        # drop any page (and forensics) output from waves after the checkpoint
        if self.output_dir:
            for root in (self.output_dir, f"{self.output_dir}_failed_attachments"):
                if not os.path.isdir(root):
                    continue
                for d in os.listdir(root):
                    if d.startswith("wave=") and int(d.split("=")[1]) > manifest["wave"]:
                        import shutil

                        shutil.rmtree(os.path.join(root, d))
        return self.wave


# ---------------------------------------------------------------------
# module-level wave machinery (shared by the sequential engine path and
# the per-shard supervisor actors)
def _wave_blocks(
    rows: list[dict], wave: int, batch_size: int, parallelism: int
) -> list[pa.Table]:
    table = pa.table(
        {
            "site": pa.array([r["site"] for r in rows], type=pa.string()),
            "url": pa.array([r["url"] for r in rows], type=pa.string()),
            "base_url": pa.array([r["base_url"] for r in rows], type=pa.string()),
            "dispatch_index": pa.array(
                [r["dispatch_index"] for r in rows], type=pa.int64()
            ),
            "wave": pa.array([wave] * len(rows), type=pa.int32()),
        }
    )
    # pre-split into blocks so fetch/parse parallelize across the pool;
    # target an even MULTIPLE of the CPU share (2p) so the last
    # scheduling round isn't a straggler (e.g. 6 blocks on 4 CPUs =
    # a 4+2 tail that idles half the cores for a full block time)
    n = table.num_rows
    p = max(1, parallelism)
    chunk = max(1, min(batch_size, (n + 2 * p - 1) // (2 * p)))
    return [table.slice(i, chunk) for i in range(0, n, chunk)]


def _build_wave_dataset(
    rows: list[dict], wave: int, batch_size: int, parallelism: int
):
    return ray.data.from_arrow(_wave_blocks(rows, wave, batch_size, parallelism))


# worker-global prompts cache for the task-fanout path (one object-store
# fetch per worker process, not per task)
_PROMPTS_CACHE: dict[str, dict] = {}


@ray.remote
def _wave_block_task(
    tbl: pa.Table,
    web_ref_box: list,
    route_attachments: bool,
    link_cap,
    prompts_ref_box,
    ctrl_cols: tuple,
) -> pa.Table:
    """One wave block through the SAME fused kernel the Dataset path
    runs (fetch→parse→enrich [→feedback] → control projection), as one
    plain Ray task.  Rationale (measured): a trivial
    from_arrow→map_batches Dataset execution costs ~80 ms of driver-side
    planning/executor startup per wave, a plain fan-out ~9 ms — and the
    iterative crawl pays that fixed cost waves × shards times, on shard
    loops that share the driver's GIL.  The physical plan is identical
    (one task per pre-split block, block order = dispatch order); this
    is a bounded fan-out inside one wave, not a hand-rolled pipeline —
    everything dataset-shaped (page sink, queries, refine) stays on
    Ray Data."""
    out = crawl_wave_stateless(tbl, web_ref_box[0], route_attachments, link_cap)
    if prompts_ref_box is not None:
        ref = prompts_ref_box[0]
        key = getattr(ref, "hex", lambda: str(id(ref)))()
        prompts = _PROMPTS_CACHE.get(key)
        if prompts is None:
            prompts = ray.get(ref)
            _PROMPTS_CACHE[key] = prompts
        out = FeedbackScorer(prompts)(out)
    return out.select(list(ctrl_cols))


def _submit_wave_tasks(
    rows: list[dict],
    wave: int,
    batch_size: int,
    parallelism: int,
    web_ref,
    route_attachments: bool,
    link_cap,
    prompts_ref,
    ctrl_cols: list[str],
) -> list:
    """Task-fanout wave execution: returns the block ObjectRefs (in
    dispatch order) for ``ingest_wave`` — the shard re-sorts by
    ``dispatch_index`` regardless, so ordering semantics are identical
    to the Dataset path."""
    blocks = _wave_blocks(rows, wave, batch_size, parallelism)
    pbox = [prompts_ref] if prompts_ref is not None else None
    return [
        _wave_block_task.remote(
            b, [web_ref], route_attachments, link_cap, pbox, tuple(ctrl_cols)
        )
        for b in blocks
    ]


def _sink_failed_attachments_to(mat, output_dir: str, subdir: str) -> None:
    """Explode per-page attachment parse failures into the
    ``<output>_failed_attachments/<subdir>`` side table (the
    reference's per-failure raw-bytes + .meta.json archive,
    data_extractor_2.py:145-161).  A failure appears BOTH here and
    as a ``media_failed`` span in the pages table."""

    def explode(batch: pa.Table) -> pa.Table:
        cols = {
            "site": [], "page_url": [], "name": [],
            "attachment_url": [], "reason": [], "payload_ref": [],
        }
        for site, url, fails in zip(
            batch["site"].to_pylist(),
            batch["url"].to_pylist(),
            batch["failed_attachments"].to_pylist(),
        ):
            for f in fails or []:
                cols["site"].append(site)
                cols["page_url"].append(url)
                cols["name"].append(f["name"])
                cols["attachment_url"].append(f["attachment_url"])
                cols["reason"].append(f["reason"])
                cols["payload_ref"].append(f["payload_ref"])
        return pa.table({k: pa.array(v, type=pa.string()) for k, v in cols.items()})

    fails = mat.map_batches(explode, batch_format="pyarrow").materialize()
    if fails.count() > 0:
        fails.write_parquet(os.path.join(f"{output_dir}_failed_attachments", subdir))


def _checkpoint_shard_blob(shard, shard_idx: int, wave: int, checkpoint_dir: str) -> None:
    blob = ray.get(shard.checkpoint_blob.remote())
    shard_dir = os.path.join(checkpoint_dir, f"shard_{shard_idx}")
    os.makedirs(shard_dir, exist_ok=True)
    tmp = os.path.join(shard_dir, f".tmp_wave_{wave:05d}.pkl")
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, os.path.join(shard_dir, f"wave_{wave:05d}.pkl"))


def _run_shard_waves(shard, shard_idx: int, web_ref, cfg: dict, start_wave: int = 0) -> dict:
    """One shard's independent wave loop.  Per-site semantics are
    identical to the global loop (a site lives on exactly one shard);
    shards simply stop synchronizing with each other, so executor fixed
    costs and ingest overlap across shards.

    With a page sink, waves write to ``shard=<i>/wave=<k>`` dirs; with a
    checkpoint dir, the shard's state is checkpointed after *its own*
    every wave (shards are independent, so per-shard checkpoints need
    no barrier)."""
    totals = {"dispatched": 0, "saved": 0, "filtered": 0, "waves": start_wave}
    metrics: list[dict] = []
    ctrl_cols = ["site", "url", "dispatch_index", "ok", "content_sha256", "page_links"]
    if cfg["feedback"]:
        ctrl_cols.append("fb_score")
    wave = start_wave
    while True:
        t_wave0 = time.perf_counter()
        t_plan = time.time()  # absolute grant instant (politeness lineage)
        rows = ray.get(shard.plan_wave.remote(cfg["wave_horizon"]))
        if not rows:
            break
        if cfg.get("task_fanout") and not cfg["output_dir"]:
            block_refs = _submit_wave_tasks(
                rows, wave, cfg["fetch_batch_size"],
                max(1, cfg["fetch_concurrency"] // cfg["num_shards"]),
                web_ref, cfg["route_attachments"], cfg["link_cap"],
                cfg.get("prompts_ref") if cfg["feedback"] else None, ctrl_cols,
            )
            out = ray.get(shard.ingest_wave.remote(block_refs, cfg["feedback"]))
            if cfg["checkpoint_dir"]:
                _checkpoint_shard_blob(shard, shard_idx, wave, cfg["checkpoint_dir"])
            totals["dispatched"] += len(rows)
            totals["saved"] += out["saved"]
            totals["filtered"] += len(rows) - out["ok"]
            totals["waves"] = wave + 1
            metrics.append(
                {
                    "wave": wave,
                    "partition": shard_idx,
                    "fetched": len(rows),
                    "parsed": out["ok"],
                    "filtered": len(rows) - out["ok"],
                    "accepted": out["saved"],
                    "wall_s": time.perf_counter() - t_wave0,
                    "t_plan": t_plan,
                }
            )
            wave += 1
            continue
        ds = _build_wave_dataset(
            rows,
            wave,
            cfg["fetch_batch_size"],
            max(1, cfg["fetch_concurrency"] // cfg["num_shards"]),
        )
        ds = ds.map_batches(
            crawl_wave_stateless,
            fn_args=(web_ref, cfg["route_attachments"], cfg["link_cap"]),
            batch_size=None,  # whole input block per task (no coalescing)
            batch_format="pyarrow",
        )
        if cfg["feedback"]:
            prompts = cfg["prompts"]

            def fb(batch: pa.Table) -> pa.Table:
                return FeedbackScorer(prompts)(batch)

            ds = ds.map_batches(fb, batch_size=None, batch_format="pyarrow")
        if cfg["output_dir"]:
            mat = ds.materialize()
            wave_dir = os.path.join(
                cfg["output_dir"], f"shard={shard_idx}", f"wave={wave:05d}"
            )
            mat.drop_columns(
                ["page_links", "wave", "failed_attachments"]
            ).write_parquet(wave_dir)
            _sink_failed_attachments_to(
                mat, cfg["output_dir"], os.path.join(f"shard={shard_idx}", f"wave={wave:05d}")
            )
            block_refs = mat.select_columns(ctrl_cols).to_arrow_refs()
        else:
            ds = ds.map_batches(
                lambda t, cols=tuple(ctrl_cols): t.select(list(cols)),
                batch_format="pyarrow",
            )
            block_refs = [
                r for bundle in ds.iter_internal_ref_bundles() for r in bundle.block_refs
            ]
        out = ray.get(shard.ingest_wave.remote(block_refs, cfg["feedback"]))
        if cfg["checkpoint_dir"]:
            _checkpoint_shard_blob(shard, shard_idx, wave, cfg["checkpoint_dir"])
        totals["dispatched"] += len(rows)
        totals["saved"] += out["saved"]
        totals["filtered"] += len(rows) - out["ok"]
        totals["waves"] = wave + 1
        # per-partition lineage/metrics row (partition = shard)
        metrics.append(
            {
                "wave": wave,
                "partition": shard_idx,
                "fetched": len(rows),
                "parsed": out["ok"],
                "filtered": len(rows) - out["ok"],
                "accepted": out["saved"],
                "wall_s": time.perf_counter() - t_wave0,
                "t_plan": t_plan,
            }
        )
        wave += 1
    return {"totals": totals, "metrics": metrics}


@ray.remote(num_cpus=0)
class _ShardWaveRunner:
    """Per-shard wave-loop supervisor: one actor PROCESS per shard, so
    N shards drive N independent streaming executors instead of N
    executor threads contending for the engine driver's GIL.  On a
    multi-node cluster this is the per-node wave-driver shape; locally
    it removes the driver as a coordination bottleneck.  ``num_cpus=0``
    — the runner only coordinates; the wave's tasks carry the CPU
    requests.

    Deployment requirement: the runner writes checkpoints and
    page/forensics parquet through ``cfg``'s plain filesystem paths
    from whichever node hosts the actor — on a real cluster those paths
    must be on a SHARED filesystem (NFS / FUSE-mounted object store),
    or the driver's ``restore_parallel`` / metrics reads won't see
    them.  (Alternative for share-nothing clusters: route the blobs
    back to the driver via the object store and write there.)"""

    def __init__(self):
        from ray.data import DataContext

        DataContext.get_current().enable_progress_bars = False

    def run(self, shard, shard_idx: int, web_ref_box: list, cfg: dict, start_wave: int = 0) -> dict:
        # web_ref arrives boxed in a list so Ray does NOT auto-deref it:
        # the runner forwards the REF to map_batches tasks (worker-global
        # cache keys on the ref, and the web is never copied per actor)
        return _run_shard_waves(shard, shard_idx, web_ref_box[0], cfg, start_wave)
