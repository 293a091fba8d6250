"""Cluster engine: shard + replicate the store across engine servers.

Role parity: Vespa content-cluster distribution — documents hashed across
content nodes by distribution key with ``redundancy 2`` (reference
scripts/vespa_local/services.xml:12-20, SURVEY.md D1). Topology is a list
of shard groups, each a list of replica URLs:

    ClusterEngine([["http://node0:8080", "http://node1:8080"],   # shard 0
                   ["http://node2:8080", "http://node3:8080"]])  # shard 1

Writes go to EVERY replica of the owning shard (a write that reaches no
replica fails the document); reads/queries hit one healthy replica per
shard (round-robin with failover — the reference's graceful-degradation
posture: partial coverage is served, exact-search callers can reject it).
Queries fan out per shard on a thread pool and merge by score.

Same duck-typed interface as StoreEngine/RemoteStoreEngine, so Config can
wire it via MARQO_ENGINE_CLUSTER (JSON topology).
"""

import concurrent.futures
import itertools
import threading
import zlib
from typing import Dict, List, Optional

from marqo_tpu.core.exceptions import BackendCommunicationError
from marqo_tpu.engine.client import RemoteStoreEngine
from marqo_tpu.engine.descriptor import IndexDescriptor
from marqo_tpu.engine.store import Hit, QueryResult
from marqo_tpu.logging import get_logger

logger = get_logger(__name__)


class _ShardGroup:
    def __init__(self, replica_urls: List[str]):
        self.replicas = [RemoteStoreEngine(url) for url in replica_urls]
        self._rr = itertools.cycle(range(len(self.replicas)))
        self._lock = threading.Lock()
        # set when a write reached only SOME replicas — the auto-heal sweep
        # (ClusterEngine._heal_loop) prioritizes flagged shards, the way
        # Vespa's distributor reacts to a node coming back after missing
        # feeds rather than waiting for a periodic scan
        self.degraded = False

    def write_all(self, fn_name: str, *args, **kwargs):
        """Apply a mutation on every replica; succeed if ≥1 replica acks
        (failed replicas are flagged for the auto-heal sweep). Returns the
        per-replica return values of the acking replicas.

        Exception: a 507 feed-block from ANY replica fails the write with
        that 507 — Vespa blocks the whole cluster's feed when one content
        node exceeds a resource limit, rather than quietly writing short
        and letting repair push the refused docs onto the full node. If
        other replicas already applied the doc, the shard is flagged so
        anti-entropy reconciles once space frees."""
        from marqo_tpu.engine.client import EngineHTTPError
        errors = []
        results = []
        for replica in self.replicas:
            try:
                results.append(getattr(replica, fn_name)(*args, **kwargs))
            except Exception as e:
                errors.append(e)
                logger.warning(f"Replica write {fn_name} failed on "
                               f"{replica.base_url}: {e}")
        feed_block = next(
            (e for e in errors
             if isinstance(e, EngineHTTPError) and e.status == 507), None)
        if feed_block is not None:
            if results:
                self.degraded = True
            raise feed_block
        if not results:
            raise BackendCommunicationError(
                f"All replicas failed {fn_name}: {errors[0]}")
        if errors:
            self.degraded = True
        return results

    def read_one(self, fn_name: str, *args, **kwargs):
        """Round-robin read with failover across replicas (a timed-out
        replica fails over like an unreachable one — another replica may
        answer within the deadline)."""
        from marqo_tpu.core.exceptions import BackendTimeoutError
        with self._lock:
            order = [next(self._rr) for _ in range(len(self.replicas))]
        last_error = None
        for idx in order:
            try:
                return getattr(self.replicas[idx], fn_name)(*args, **kwargs)
            except (BackendCommunicationError, BackendTimeoutError) as e:
                last_error = e
                continue
        raise last_error

    def close(self):
        for replica in self.replicas:
            replica.close()


class ClusterEngine:
    def __init__(self, topology: List[List[str]], pool_size: int = 8,
                 heal_interval_s: Optional[float] = None):
        if not topology or not all(topology):
            raise ValueError("Cluster topology needs ≥1 shard with ≥1 replica")
        self.shards = [_ShardGroup(urls) for urls in topology]
        self._pool = concurrent.futures.ThreadPoolExecutor(
            max_workers=max(pool_size, len(self.shards)))
        # continuous anti-entropy (the Vespa distributor repairs replicas
        # continuously; reference services.xml redundancy contract):
        #   interval > 0 — degraded-flagged shards heal within ~2s of the
        #                  failed write, plus a full digest sweep every
        #                  interval seconds as a backstop
        #   interval = 0 — failover-triggered repair only (default: flagged
        #                  shards heal, no periodic digest cost)
        #   interval < 0 — fully disabled (manual /ops/heal still works)
        if heal_interval_s is None:
            from marqo_tpu.api import configs
            heal_interval_s = float(configs.read_env_vars_and_defaults(
                "MARQO_CLUSTER_HEAL_INTERVAL") or 0)
        self._heal_interval_s = heal_interval_s
        self._stop_heal = threading.Event()
        if heal_interval_s >= 0:
            threading.Thread(target=self._heal_loop, daemon=True,
                             name="cluster-anti-entropy").start()

    def _heal_loop(self):
        tick = min(2.0, self._heal_interval_s) if self._heal_interval_s > 0 \
            else 2.0
        since_full = 0.0
        while not self._stop_heal.wait(tick):
            since_full += tick
            flagged = [s for s in self.shards if s.degraded]
            full_due = (self._heal_interval_s > 0 and
                        since_full >= self._heal_interval_s)
            if not flagged and not full_due:
                continue
            since_full = 0.0
            for shard in flagged:
                shard.degraded = False  # new failures re-flag during heal
            try:
                report = self.heal_all()
                for name, out in report.items():
                    if out.get("healed"):
                        logger.info(f"auto-heal repaired {name}: "
                                    f"{out['healed']}")
                    # a sync that failed (unreachable / feed-blocked
                    # destination) must keep its shard flagged, else the
                    # repair signal is lost until the next failed write
                    for failure in out.get("failed", ()):
                        self.shards[failure["shard"]].degraded = True
            except Exception as e:
                # the sweep itself died (e.g. list_indexes during a node
                # flap) — restore the flags it consumed so the divergence
                # is retried on the next tick instead of silently dropped
                for shard in flagged:
                    shard.degraded = True
                logger.warning(f"auto-heal sweep failed: {e}")

    # -- routing --

    def _shard_for(self, doc_id: str) -> _ShardGroup:
        # Stable across API-process restarts (builtin hash() is salted per
        # process; docs fed by a previous process must keep routing to the
        # same shard for get/delete to find them).
        return self.shards[zlib.crc32(doc_id.encode("utf-8")) % len(self.shards)]

    def _fanout_reads(self, fn_name: str, *args, **kwargs) -> List:
        futures = [self._pool.submit(shard.read_one, fn_name, *args, **kwargs)
                   for shard in self.shards]
        return [f.result() for f in futures]

    # -- DDL (all shards, all replicas) --

    def create_index(self, descriptor: IndexDescriptor) -> None:
        for shard in self.shards:
            shard.write_all("create_index", descriptor)

    def update_index(self, descriptor: IndexDescriptor) -> None:
        for shard in self.shards:
            shard.write_all("update_index", descriptor)

    def delete_index(self, name: str) -> None:
        for shard in self.shards:
            shard.write_all("delete_index", name)

    def has_index(self, name: str) -> bool:
        return self.shards[0].read_one("has_index", name)

    def list_indexes(self) -> List[str]:
        return self.shards[0].read_one("list_indexes")

    # -- documents --

    def feed(self, index_name: str, doc_id: str, fields: dict,
             tensors: Optional[dict] = None) -> None:
        self._shard_for(doc_id).write_all("feed", index_name, doc_id,
                                          fields, tensors)

    def get(self, index_name: str, doc_id: str) -> Optional[dict]:
        return self._shard_for(doc_id).read_one("get", index_name, doc_id)

    def get_tensors(self, index_name: str, doc_id: str) -> Dict[str, list]:
        return self._shard_for(doc_id).read_one("get_tensors", index_name,
                                                doc_id)

    def update(self, index_name: str, doc_id: str, updates: dict) -> bool:
        acks = self._shard_for(doc_id).write_all("update", index_name,
                                                 doc_id, updates)
        return any(acks)

    def delete(self, index_name: str, doc_id: str) -> bool:
        # any(): per-replica found flags — deleting an absent doc must
        # report found=False (in-process store.delete parity), not "some
        # replica acked the call"
        acks = self._shard_for(doc_id).write_all("delete", index_name, doc_id)
        return any(acks)

    def delete_all(self, index_name: str) -> int:
        deleted = 0
        for shard in self.shards:
            deleted += shard.read_one("doc_count", index_name)
            shard.write_all("delete_all", index_name)
        return deleted

    def doc_count(self, index_name: str) -> int:
        return sum(self._fanout_reads("doc_count", index_name))

    def vector_count(self, index_name: str) -> int:
        return sum(self._fanout_reads("vector_count", index_name))

    # -- queries: fan out per shard, merge by score --

    @staticmethod
    def _merge(results: List[QueryResult], limit: int,
               offset: int) -> QueryResult:
        hits: List[Hit] = []
        total = 0
        for result in results:
            hits.extend(result.hits)
            total += result.total
        hits.sort(key=lambda h: (-h.score, h.doc_id))
        return QueryResult(hits[offset:offset + limit], total)

    def query_tensor(self, index_name: str, vector, limit: int,
                     offset: int = 0, **kwargs) -> QueryResult:
        # each shard returns its local top-(limit+offset); merge globally
        results = self._fanout_reads(
            "query_tensor", index_name, vector, limit=limit + offset,
            offset=0, **kwargs)
        return self._merge(results, limit, offset)

    def _global_lexical_stats(self, index_name: str, or_phrases,
                              and_phrases, searchable_fields) -> dict:
        """Fan out lexical_stats and sum per-field statistics across shards
        so every shard scores BM25 with GLOBAL document frequencies —
        single-node-identical ranking (Vespa content clusters expose
        cluster-wide idf to ranking the same way; reference
        HybridSearcher.java:154-285 fuses legs assuming globally-comparable
        scores)."""
        from marqo_tpu.engine.bm25 import tokenize
        terms = sorted({t for phrase in list(or_phrases) + list(and_phrases)
                        for t in tokenize(phrase)})
        if not terms:
            return {}
        per_shard = self._fanout_reads("lexical_stats", index_name, terms,
                                       searchable_fields=searchable_fields)
        merged: Dict[str, dict] = {}
        for shard_stats in per_shard:
            for field, stats in (shard_stats or {}).items():
                slot = merged.setdefault(
                    field, {"num_docs": 0, "total_length": 0, "df": {}})
                slot["num_docs"] += int(stats.get("num_docs", 0))
                slot["total_length"] += int(stats.get("total_length", 0))
                for term, df in (stats.get("df") or {}).items():
                    slot["df"][term] = slot["df"].get(term, 0) + int(df)
        return merged

    def query_lexical(self, index_name: str, or_phrases, and_phrases,
                      limit: int, offset: int = 0, **kwargs) -> QueryResult:
        stats = self._global_lexical_stats(
            index_name, or_phrases, and_phrases,
            kwargs.get("searchable_fields"))
        results = self._fanout_reads(
            "query_lexical", index_name, or_phrases, and_phrases,
            limit=limit + offset, offset=0, global_stats=stats, **kwargs)
        return self._merge(results, limit, offset)

    def query_hybrid(self, index_name: str, vector, or_phrases, and_phrases,
                     limit: int, offset: int = 0,
                     retrieval_method: str = "disjunction",
                     ranking_method: str = "rrf",
                     alpha: float = 0.5, rrf_k: int = 60,
                     searchable_fields_tensor=None,
                     searchable_fields_lexical=None, search_filter=None,
                     score_modifiers_tensor=None,
                     score_modifiers_lexical=None, ef_search=None,
                     approximate=True, attributes_to_retrieve=None,
                     expose_facets=False) -> QueryResult:
        if retrieval_method == "disjunction" and ranking_method == "rrf":
            # GLOBAL-rank RRF: gather each leg from every shard, rank each
            # leg globally by score, then fuse — identical semantics to a
            # single-node index (HybridSearcher.java fuses global legs too).
            # The lexical leg scores with cluster-wide idf (global stats
            # exchange) so its global ranking is exact, not per-shard.
            max_leg = limit + offset
            lexical_global_stats = self._global_lexical_stats(
                index_name, or_phrases, and_phrases,
                searchable_fields_lexical)
            common = dict(limit=max_leg, offset=0,
                          search_filter=search_filter,
                          attributes_to_retrieve=attributes_to_retrieve,
                          expose_facets=expose_facets)
            tensor_futures = [
                self._pool.submit(shard.read_one, "query_tensor", index_name,
                                  vector,
                                  searchable_fields=searchable_fields_tensor,
                                  score_modifiers=score_modifiers_tensor,
                                  ef_search=ef_search,
                                  approximate=approximate, **common)
                for shard in self.shards]
            lexical_futures = [
                self._pool.submit(shard.read_one, "query_lexical", index_name,
                                  or_phrases, and_phrases,
                                  searchable_fields=searchable_fields_lexical,
                                  score_modifiers=score_modifiers_lexical,
                                  global_stats=lexical_global_stats,
                                  **common)
                for shard in self.shards]
            tensor_hits: List[Hit] = []
            for f in tensor_futures:
                tensor_hits.extend(f.result().hits)
            lexical_hits: List[Hit] = []
            for f in lexical_futures:
                lexical_hits.extend(f.result().hits)
            tensor_hits.sort(key=lambda h: (-h.score, h.doc_id))
            lexical_hits.sort(key=lambda h: (-h.score, h.doc_id))

            fused: Dict[str, float] = {}
            by_id: Dict[str, Hit] = {}
            raw_tensor: Dict[str, float] = {}
            raw_lexical: Dict[str, float] = {}
            for rank, hit in enumerate(tensor_hits[:max_leg]):
                fused[hit.doc_id] = fused.get(hit.doc_id, 0.0) + \
                    alpha * (1.0 / (rank + 1 + rrf_k))
                raw_tensor[hit.doc_id] = hit.score
                by_id.setdefault(hit.doc_id, hit)
            for rank, hit in enumerate(lexical_hits[:max_leg]):
                fused[hit.doc_id] = fused.get(hit.doc_id, 0.0) + \
                    (1.0 - alpha) * (1.0 / (rank + 1 + rrf_k))
                raw_lexical[hit.doc_id] = hit.score
                by_id.setdefault(hit.doc_id, hit)
            ranked = sorted(fused.items(), key=lambda kv: (-kv[1], kv[0]))
            hits = []
            for doc_id, score in ranked[offset:offset + limit]:
                src = by_id[doc_id]
                hits.append(Hit(doc_id, score, src.fields, src.highlight,
                                raw_tensor.get(doc_id),
                                raw_lexical.get(doc_id)))
            return QueryResult(hits, len(ranked))

        # non-RRF combos: per-shard execution then score merge (lexical
        # scores still use cluster-wide idf so the merge is globally valid)
        results = self._fanout_reads(
            "query_hybrid", index_name, vector, or_phrases, and_phrases,
            limit=limit + offset, offset=0,
            global_stats=self._global_lexical_stats(
                index_name, or_phrases, and_phrases,
                searchable_fields_lexical),
            retrieval_method=retrieval_method, ranking_method=ranking_method,
            alpha=alpha, rrf_k=rrf_k,
            searchable_fields_tensor=searchable_fields_tensor,
            searchable_fields_lexical=searchable_fields_lexical,
            search_filter=search_filter,
            score_modifiers_tensor=score_modifiers_tensor,
            score_modifiers_lexical=score_modifiers_lexical,
            ef_search=ef_search, approximate=approximate,
            attributes_to_retrieve=attributes_to_retrieve,
            expose_facets=expose_facets)
        return self._merge(results, limit, offset)

    # -- health --

    def engine_health(self) -> dict:
        """Aggregate per-replica reachability into green/yellow/red
        (reference monitoring.py:89-154 aggregates Vespa node/service
        state): a shard with every replica up is green, with some up is
        yellow, with none up is red; the cluster reports the worst shard.
        Probes run concurrently with short timeouts."""
        rank = {"green": 0, "yellow": 1, "red": 2}

        def probe(shard_index, replica):
            report = replica.engine_health()
            node = dict(report["nodes"][0])
            node["shard"] = shard_index
            return node

        futures = [self._pool.submit(probe, i, replica)
                   for i, shard in enumerate(self.shards)
                   for replica in shard.replicas]
        nodes = [f.result() for f in futures]
        worst = "green"
        for shard_index in range(len(self.shards)):
            shard_nodes = [n for n in nodes if n["shard"] == shard_index]
            up = [n for n in shard_nodes if n["status"] != "red"]
            if not up:
                shard_status = "red"
            elif len(up) < len(shard_nodes) or \
                    any(n["status"] == "yellow" for n in up):
                shard_status = "yellow"
            else:
                shard_status = "green"
            if rank[shard_status] > rank[worst]:
                worst = shard_status
        return {"status": worst, "nodes": nodes}

    # -- replica anti-entropy --

    def heal(self, index_name: str) -> dict:
        """Re-sync diverged replicas within each shard group (role of
        Vespa's internal replica redistribution when a content node missed
        writes while down). Divergence is detected with an
        order-independent content digest; the source of truth is elected by
        the durable MUTATION SEQUENCE (store.index_digest "seq": advanced
        per applied mutation, persisted in snapshots, adopted on sync) with
        doc count only as a tiebreak. Doc-count-first election resurrects
        missed DELETES: the replica that missed a delete holds MORE docs,
        wins, and pushes the deleted doc back onto the healthy replica.

        Known limit (documented, matches redundancy-without-vector-clocks):
        if BOTH replicas independently accepted writes the other missed
        (split acceptance during a partition), the higher-seq side wins and
        the loser's unique writes are dropped — per-document reconciliation
        needs per-doc versions, which Vespa likewise scopes to its
        distributor timestamps."""
        healed = []
        failed = []
        for shard_index, shard in enumerate(self.shards):
            if len(shard.replicas) < 2:
                continue
            digests = []
            for replica in shard.replicas:
                try:
                    digests.append(replica.index_digest(index_name))
                except Exception as e:
                    logger.warning(f"heal: digest failed on "
                                   f"{replica.base_url}: {e}")
                    digests.append(None)
            known = [d for d in digests if d is not None]
            if len({(d["doc_count"], d["checksum"]) for d in known}) <= 1:
                continue  # replicas agree (or only one answered)
            source_index = max(
                (i for i, d in enumerate(digests) if d is not None),
                key=lambda i: (digests[i].get("seq", 0),
                               digests[i]["doc_count"]))
            source = shard.replicas[source_index]
            for i, replica in enumerate(shard.replicas):
                if i == source_index or digests[i] is None:
                    continue
                if (digests[i]["doc_count"], digests[i]["checksum"]) == \
                        (digests[source_index]["doc_count"],
                         digests[source_index]["checksum"]):
                    continue
                try:
                    out = replica.sync_from(source.base_url, index_name)
                    healed.append({"shard": shard_index,
                                   "replica": replica.base_url,
                                   "from": source.base_url,
                                   "docs": out.get("synced_docs")})
                except Exception as e:
                    logger.warning(f"heal: sync failed on "
                                   f"{replica.base_url}: {e}")
                    failed.append({"shard": shard_index,
                                   "replica": replica.base_url,
                                   "error": str(e)})
        return {"healed": healed, "failed": failed}

    def heal_all(self) -> dict:
        out = {}
        for name in self.list_indexes():
            out[name] = self.heal(name)
        return out

    def close(self):
        self._stop_heal.set()
        for shard in self.shards:
            shard.close()
        self._pool.shutdown(wait=False)
