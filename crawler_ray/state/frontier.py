"""Sharded URL-frontier service — the centerpiece rebuild (SURVEY.md §7).

``FrontierShard`` is a plain Ray actor; sites (hosts) hash-partition
across shards (``shard_of(host)``), so all state for one host — FIFO
queue, exact visited set, Bloom fast-path filter, cuckoo filter for
retractable failures, ledger, KB stats, politeness clock, robots rules
— lives on exactly one shard.  The driver's wave loop asks every shard
to *plan* a wave (dequeue up to the per-site batch budget, applying
knowledge-base filters at dequeue time), runs the fetch→parse→enrich
Dataset pipeline, then feeds ordered results back via
``ingest_results`` (enqueue of discovered links, first-seen dedup,
ledger change-detection).

Ordering contract (SURVEY.md §3.4): FIFO dequeue + KB dequeue filters +
in-document link order + first-seen-wins enqueue + submission-order
result processing ⇒ the reference's crawl order, reproduced per site.

Membership check order: Bloom first (no false negatives — a miss is a
guaranteed-new URL and skips the exact probe); on Bloom hit, the exact
per-site set decides, so false positives can never drop URLs.

Checkpointing: ``checkpoint()`` returns a picklable state blob per
shard (queues, sets, filter bits, clocks, counters); the engine writes
them atomically per wave (tmp + rename) for resume.
"""

from __future__ import annotations

import hashlib
import pickle
from collections import deque
from urllib.parse import urlparse

import ray

from crawler_ray.functions.urls import is_valid_url, kb_pattern
from crawler_ray.state.bloom import BloomFilter
from crawler_ray.state.cuckoo import CuckooFilter
from crawler_ray.state.politeness import PolitenessQueue
from crawler_ray.state.robots import RobotsCache

QUEUE_CAP = 10_000  # reference memory guard (high_performance_crawler_agent.py:232-235)


def shard_of(host: str, num_shards: int) -> int:
    d = hashlib.blake2b(host.encode("utf-8"), digest_size=8).digest()
    return int.from_bytes(d, "little") % num_shards


class CrawlProfile:
    """Ordering-relevant knobs of the two reference agent profiles."""

    def __init__(
        self,
        name: str = "hp",
        link_cap: int | None = None,
        count_dispatched: bool = True,
        ledger_add_at_crawl: bool = True,
        queue_cap: int = QUEUE_CAP,
    ):
        self.name = name
        self.link_cap = link_cap
        self.count_dispatched = count_dispatched
        self.ledger_add_at_crawl = ledger_add_at_crawl
        self.queue_cap = queue_cap

    @classmethod
    def hp(cls) -> "CrawlProfile":
        """HighPerformanceCrawlerAgent: batch=min(100, max//10), no link
        cap, every dispatched URL counts toward max_pages."""
        return cls("hp")

    @classmethod
    def fast(cls) -> "CrawlProfile":
        """FastCrawlerAgent: batch=min(20, max//5), links[:50] cap, only
        pages with non-empty text count, ledger written by the worker."""
        return cls(
            "fast", link_cap=50, count_dispatched=False, ledger_add_at_crawl=False
        )

    def batch_size(self, max_pages: int) -> int:
        if self.name == "fast":
            return max(1, min(20, max_pages // 5))
        return max(1, min(100, max_pages // 10))

    def state(self) -> dict:
        return dict(self.__dict__)


class _SiteState:
    def __init__(self, config: dict, profile: CrawlProfile, bloom_capacity: int):
        self.config = dict(config)
        self.site = config["site_identifier"]
        self.base_url = config["base_url"]
        self.base_netloc = urlparse(self.base_url).netloc
        self.max_pages = int(config.get("max_pages", config.get("max_pages_to_crawl", 50)))
        self.crawl_delay = float(config.get("crawl_delay", 1.0))
        self.profile = profile
        self.queue: deque[str] = deque([self.base_url])
        self.visited: set[str] = {self.base_url}
        self.failed: set[str] = set()
        self.bloom = BloomFilter(bloom_capacity)
        self.bloom.add(self.base_url)
        self.retractable = CuckooFilter(max(1024, bloom_capacity // 8))
        self.ledger: dict[str, str] = {}
        self.kb: dict[str, dict] = {}
        self.pages_counted = 0
        self.fetch_order = 0
        self.stats = {
            "dispatched": 0,
            "saved": 0,
            "links_queued": 1,
            "links_ignored_by_kb": 0,
            "links_ignored_as_problematic": 0,
            "pages_skipped_as_unchanged": 0,
            "queue_overflow_dropped": 0,
        }
        self.exhausted = False

    # -- KB filters (dequeue-time; knowledge_base.py:61-67) ------------
    def _kb_should_ignore(self, url: str) -> bool:
        e = self.kb.get(kb_pattern(url))
        return bool(e and e["count"] >= 3 and e["avg_score"] < 0.4)

    def _kb_is_problematic(self, url: str) -> bool:
        e = self.kb.get(kb_pattern(url))
        return bool(e and e["failure_count"] >= 3)

    def collect_batch(self, budget_cap: int | None = None) -> list[str]:
        if self.exhausted or self.pages_counted >= self.max_pages:
            self.exhausted = True
            return []
        size = self.profile.batch_size(self.max_pages)
        if budget_cap is not None:
            size = min(size, budget_cap)
        batch: list[str] = []
        while len(batch) < size and self.queue:
            url = self.queue.popleft()
            if self._kb_should_ignore(url):
                self.stats["links_ignored_by_kb"] += 1
                continue
            if self._kb_is_problematic(url):
                self.stats["links_ignored_as_problematic"] += 1
                continue
            batch.append(url)
        if not batch and not self.queue:
            self.exhausted = True
        self.stats["dispatched"] += len(batch)
        if self.profile.count_dispatched:
            self.pages_counted += len(batch)
        return batch

    def enqueue_links(
        self, links: list[str], robots: RobotsCache, valid: list[bool] | None = None
    ) -> int:
        """First-seen ordered enqueue.  ``valid`` is an optional
        pre-computed validity mask (the ingest path vectorizes
        ``is_valid_url`` over the whole wave with pyarrow kernels —
        validity is per-link-independent, so hoisting it out of the
        sequential dedup loop is safe).

        The shard's exact set decides membership (first-seen dedup must
        also catch duplicates *within* a batch, which a pre-computed
        Bloom mask would miss).  The Bloom is maintained in lockstep —
        batched after the loop — as the checkpointable fast-path
        structure for cross-shard probes (`maybe_seen_many`), where a
        miss is a guaranteed-new URL.
        """
        added: list[str] = []
        for i, url in enumerate(links):
            if url in self.visited:
                continue
            if url in self.failed:
                continue
            if valid is not None:
                if not valid[i]:
                    continue
            elif not is_valid_url(url, self.base_netloc):
                continue
            if not robots.allowed(url):
                continue
            if len(self.queue) > self.profile.queue_cap:
                self.stats["queue_overflow_dropped"] += 1
                continue
            self.visited.add(url)
            self.queue.append(url)
            added.append(url)
        if added:
            self.bloom.add_many(added)
        self.stats["links_queued"] += len(added)
        return len(added)

    def maybe_seen_many(self, urls: list[str]):
        """Bloom fast-path membership (false positives possible, no false
        negatives) — the cheap remote probe other shards/stages use
        before paying for an exact check."""
        return self.bloom.contains_many(urls)

    def state(self) -> dict:
        return {
            "config": self.config,
            "profile": self.profile.state(),
            "queue": list(self.queue),
            "visited": sorted(self.visited),
            "failed": sorted(self.failed),
            "bloom": self.bloom.to_bytes(),
            "retractable": self.retractable.to_bytes(),
            "ledger": self.ledger,
            "kb": self.kb,
            "pages_counted": self.pages_counted,
            "fetch_order": self.fetch_order,
            "stats": self.stats,
            "exhausted": self.exhausted,
        }

    @classmethod
    def from_state(cls, st: dict, bloom_capacity: int) -> "_SiteState":
        profile = CrawlProfile(**st["profile"])
        obj = cls(st["config"], profile, bloom_capacity=64)
        obj.queue = deque(st["queue"])
        obj.visited = set(st["visited"])
        obj.failed = set(st["failed"])
        obj.bloom = BloomFilter.from_bytes(st["bloom"])
        obj.retractable = CuckooFilter.from_bytes(st["retractable"])
        obj.ledger = dict(st["ledger"])
        obj.kb = {k: dict(v) for k, v in st["kb"].items()}
        obj.pages_counted = st["pages_counted"]
        obj.fetch_order = st["fetch_order"]
        obj.stats = dict(st["stats"])
        obj.exhausted = st["exhausted"]
        return obj


class FrontierShardLocal:
    """The shard logic, usable in-process (oracle tests, single-node
    tools) or wrapped as a Ray actor (``FrontierShard``)."""

    def __init__(
        self,
        shard_id: int = 0,
        bloom_capacity: int = 1 << 16,
        robots_enabled: bool = False,
        robots_fetch=None,
        feedback_enabled: bool = False,
        wall_clock_politeness: bool = False,
    ):
        import time as _time

        self.shard_id = shard_id
        self.bloom_capacity = bloom_capacity
        self.sites: dict[str, _SiteState] = {}
        self.robots = RobotsCache(fetch_fn=robots_fetch, enabled=robots_enabled)
        # wall-clock mode anchors per-host pacing to real time (live
        # deployments); default stays the simulated virtual clock the
        # conformance oracle models.  Caveat: wall-clock next_allowed
        # values are HOST-LOCAL monotonic instants — a checkpoint
        # restored on a different host should re-register sites (one
        # extra crawl_delay of caution) rather than trust them.
        self.politeness = PolitenessQueue(
            clock=_time.monotonic if wall_clock_politeness else None
        )
        self.feedback_enabled = feedback_enabled

    # -- site management ----------------------------------------------
    def add_site(self, config: dict, profile_state: dict | None = None) -> None:
        profile = CrawlProfile(**profile_state) if profile_state else CrawlProfile.hp()
        st = _SiteState(config, profile, self.bloom_capacity)
        self.sites[st.site] = st
        self.politeness.register(st.base_netloc, st.crawl_delay)

    def set_priority(self, site: str, priority: int) -> None:
        """Reprioritize a host in the politeness queue (lower = sooner).
        e.g. KB-driven: hosts with high avg_score get negative priority
        so their waves dispatch first when budgets contend."""
        st = self.sites[site]
        self.politeness.hosts[st.base_netloc]["priority"] = priority

    def reprioritize_by_kb(self) -> None:
        """Derive per-host priority from learned KB quality: sites whose
        mean pattern avg_score is high crawl sooner (priority = -round(
        10 × mean avg_score)); unscored sites stay at 0."""
        for st in self.sites.values():
            scored = [e["avg_score"] for e in st.kb.values() if e["count"] > 0]
            if scored:
                self.politeness.hosts[st.base_netloc]["priority"] = -round(
                    10 * sum(scored) / len(scored)
                )

    # -- wave planning -------------------------------------------------
    def plan_wave(self, horizon: float = 0.0) -> list[dict]:
        """Dequeue one politeness-budgeted batch per live site; rows are
        (site, url, base_url, dispatch_index) in dispatch order."""
        rows: list[dict] = []
        # politeness order across this shard's hosts
        host_order = self.politeness.order()
        site_by_host = {st.base_netloc: st for st in self.sites.values()}
        for host in host_order:
            st = site_by_host.get(host)
            if st is None or st.exhausted:
                continue
            cap = self.politeness.budget(host, horizon) if horizon > 0 else None
            batch = st.collect_batch(cap)
            if batch:
                self.politeness.reserve(host, len(batch))
            for i, url in enumerate(batch):
                rows.append(
                    {
                        "site": st.site,
                        "url": url,
                        "base_url": st.base_url,
                        "dispatch_index": st.fetch_order + i,
                    }
                )
            st.fetch_order += len(batch)
        return rows

    def active_site_count(self) -> int:
        return sum(
            1
            for st in self.sites.values()
            if not st.exhausted and st.pages_counted < st.max_pages and st.queue
        )

    # -- result ingestion ---------------------------------------------
    def ingest_results(self, site: str, results: list[dict]) -> dict:
        """Process one site's wave results **in dispatch order**.

        Each result: {url, ok, content_sha256, links: [url, ...]}.
        Returns {saved: [urls], stats}.  Mirrors
        _process_batch_results / _process_page_result of the reference.
        """
        st = self.sites[site]
        saved: list[str] = []
        # vectorized validity over the whole batch's links (pyarrow
        # regex kernels), sliced back per page below
        all_links = [u for r in results for u in r.get("links", ())]
        if all_links:
            from crawler_ray.functions.urls import valid_url_mask

            flat_valid = valid_url_mask(all_links, st.base_netloc).to_pylist()
        link_pos = 0
        for r in results:
            links = list(r.get("links", ()))
            lv = flat_valid[link_pos : link_pos + len(links)] if links else []
            link_pos += len(links)
            ok = r["ok"] and bool(r.get("content_sha256"))
            if not self.sites[site].profile.count_dispatched:
                # fast profile: only pages with content count toward max
                if ok:
                    st.pages_counted += 1
            if not ok:
                continue
            url = r["url"]
            new_hash = r["content_sha256"]
            old = st.ledger.get(url)
            if old is not None and old == new_hash:
                st.stats["pages_skipped_as_unchanged"] += 1
                continue
            if st.profile.ledger_add_at_crawl:
                st.ledger[url] = new_hash
            saved.append(url)
            st.stats["saved"] += 1
            st.enqueue_links(links, self.robots, valid=lv)
        return {"saved": saved, "stats": dict(st.stats)}

    def ingest_wave(
        self, blocks, apply_feedback: bool = False, record_failures: bool = False
    ) -> dict:
        """Ingest a whole wave from Arrow control blocks (driver passes
        ``to_arrow_refs()`` output — zero-copy through the object store;
        the driver never loops over rows).

        Each shard filters the blocks to its own sites, re-sorts to
        dispatch order, applies the ordered enqueue logic, and (when
        ``apply_feedback``) the wave-synchronous KB update.
        """
        import pyarrow as pa
        import pyarrow.compute as pc

        tables = []
        for b in blocks:
            t = ray.get(b) if isinstance(b, ray.ObjectRef) else b
            if t.num_rows:
                tables.append(t)
        out = {"saved": 0, "ok": 0}
        if not tables:
            return out
        t = pa.concat_tables(tables)
        mine = pc.is_in(t["site"], value_set=pa.array(list(self.sites), type=pa.string()))
        t = t.filter(mine)
        if t.num_rows == 0:
            return out
        t = t.sort_by([("site", "ascending"), ("dispatch_index", "ascending")])
        sites = t["site"].to_pylist()
        urls = t["url"].to_pylist()
        oks = t["ok"].to_pylist()
        hashes = t["content_sha256"].to_pylist()
        fb = t["fb_score"].to_pylist() if "fb_score" in t.column_names else [None] * len(urls)
        # flatten the list<struct> links column once (no per-link dicts):
        # one string-array conversion + offset slicing
        pl = t.column("page_links")
        if isinstance(pl, pa.ChunkedArray):
            pl = pl.combine_chunks()
            if isinstance(pl, pa.ChunkedArray):
                pl = pl.chunk(0) if pl.num_chunks else pa.array([], type=t.schema.field("page_links").type)
        flat_urls = pl.values.field("url").to_pylist()
        offs = pl.offsets.to_pylist()
        links_col = [flat_urls[offs[k] : offs[k + 1]] for k in range(len(urls))]

        i = 0
        n = len(urls)
        while i < n:
            j = i
            site = sites[i]
            while j < n and sites[j] == site:
                j += 1
            results = [
                {
                    "url": urls[k],
                    "ok": bool(oks[k]),
                    "content_sha256": hashes[k],
                    "links": links_col[k],
                }
                for k in range(i, j)
            ]
            res = self.ingest_results(site, results)
            saved = set(res["saved"])
            out["saved"] += len(saved)
            out["ok"] += sum(1 for k in range(i, j) if oks[k])
            if record_failures:
                # permanently-failed fetches go to the failed set AND the
                # cuckoo filter, whose deletions (`retract_failure`)
                # re-enable requeue on later rediscovery — the reason a
                # Bloom filter alone can't hold this set.
                self.record_fetch_failures(
                    site, [urls[k] for k in range(i, j) if not oks[k]]
                )
            if apply_feedback:
                scores, failures = [], []
                for k in range(i, j):
                    if urls[k] not in saved or fb[k] is None:
                        continue
                    if fb[k] < 0:
                        failures.append(urls[k])
                    else:
                        scores.append((urls[k], fb[k]))
                if scores or failures:
                    self.kb_update(site, scores, failures)
            i = j
        return out

    def record_fetch_failures(self, site: str, urls: list[str]) -> None:
        st = self.sites[site]
        for u in urls:
            st.failed.add(u)
            st.retractable.add(u)

    def retract_failure(self, site: str, url: str) -> None:
        """Allow a permanently-failed URL to be requeued on rediscovery:
        removed from failed, the cuckoo filter (deletion — the Bloom
        filter cannot do this), and the exact visited set.  The Bloom
        keeps a stale positive, which is safe: it is a fast-path hint
        only and the exact set decides."""
        st = self.sites[site]
        st.failed.discard(url)
        st.retractable.remove(url)
        st.visited.discard(url)

    # -- feedback (KB) -------------------------------------------------
    def kb_update(self, site: str, scores: list[tuple[str, float]], failures: list[str]) -> None:
        """Wave-synchronous KB merge (knowledge_base.py:43-59 semantics)."""
        st = self.sites[site]
        for url, score in scores:
            p = kb_pattern(url)
            if not p:
                continue
            e = st.kb.setdefault(
                p, {"total_score": 0, "count": 0, "avg_score": 0, "failure_count": 0}
            )
            e["total_score"] += score
            e["count"] += 1
            e["avg_score"] = round(e["total_score"] / e["count"], 3)
        for url in failures:
            p = kb_pattern(url)
            if not p:
                continue
            e = st.kb.setdefault(
                p, {"total_score": 0, "count": 0, "avg_score": 0, "failure_count": 0}
            )
            e["failure_count"] += 1

    def ledger_add(self, site: str, url: str, content_hash: str) -> None:
        self.sites[site].ledger[url] = content_hash

    def preload_ledger(self, site: str, ledger: dict[str, str]) -> None:
        """Seed a prior crawl's ledger (re-crawl mode: unchanged pages
        are skipped — no save, no link enqueue — per the reference's
        has_changed semantics)."""
        self.sites[site].ledger.update(ledger)

    # -- introspection / conformance -----------------------------------
    def url_seen(self, site: str) -> list[str]:
        return sorted(self.sites[site].visited)

    def site_stats(self) -> dict:
        return {s: dict(st.stats) for s, st in self.sites.items()}

    def kb_table(self) -> list[dict]:
        rows = []
        for st in self.sites.values():
            for pattern, e in st.kb.items():
                rows.append({"site": st.site, "pattern": pattern, **e})
        return rows

    def ledger_table(self) -> list[dict]:
        rows = []
        for st in self.sites.values():
            for url, h in st.ledger.items():
                rows.append({"site": st.site, "url": url, "content_sha256": h})
        return rows

    # -- checkpointing -------------------------------------------------
    def checkpoint_blob(self) -> bytes:
        return pickle.dumps(
            {
                "shard_id": self.shard_id,
                "bloom_capacity": self.bloom_capacity,
                "sites": {s: st.state() for s, st in self.sites.items()},
                "robots": self.robots.state(),
                "politeness": self.politeness.state(),
            }
        )

    def restore_blob(self, raw: bytes) -> None:
        st = pickle.loads(raw)
        self.shard_id = st["shard_id"]
        self.bloom_capacity = st["bloom_capacity"]
        self.sites = {
            s: _SiteState.from_state(v, self.bloom_capacity)
            for s, v in st["sites"].items()
        }
        self.robots.restore(st["robots"])
        self.politeness.restore(st["politeness"])


# num_cpus=0: shards are control-plane actors that burst briefly at wave
# boundaries; reserving whole CPUs for them steals task slots from the
# fetch/parse stages (tasks then need 2 scheduling rounds per wave)
FrontierShard = ray.remote(num_cpus=0)(FrontierShardLocal)
