"""Single-threaded Python oracle: the canonical round-synchronous
crawl semantics (the golden-trace generator for the exact-match tests).

This is a faithful round-model restatement of the reference crawler's
behavior (SURVEY.md §7.0): the reference's event-driven manager/worker
loop exists to approximate exactly this determinism under concurrency,
so "exact crawl ordering" is defined at round granularity:

- priority order  = (path length ASC, created_round ASC, seq ASC)
  (reference sort: nodes.count, createdAt, _id —
  models/src/Process/process-paths.ts:675-678)
- politeness      = simulated round clock: domain admitted in round r
  iff next_allowed ≤ r; after an access, next_allowed = r + delay
  (reference: crawl.nextAllowed gate models/src/Domain.ts:326-327,
  nextAllowed = endTime + delay, Domain.ts:949-972)
- two-phase domains: unvisited domains get a robots check before any
  crawl (reference: getPathsForRobotsChecking vs getPathsForDomainCrawl,
  process-paths.ts:376-508 / 560-699)
- per-domain budget = resources_per_domain distinct head URLs per round
  (reference: config resourcesPerDomain, config/src/index.ts:62-74)
- extension        = one new path per (predicate, new-head) per parent,
  cycle/self-loop/bounds/predicate-limit/direction filters
  (models/src/Path/TraversalPath.ts:219-399, 408-449, 539-545)
- within-round cascade: a new path whose head is already fetched is
  extended immediately against the global triple store (reference:
  extendPaths runs against pre-existing triples,
  models/src/Process/Process.ts:412-493)

The Spark engine (`derzis_spark.engine`) must reproduce the trace,
seen-set, triple-set, and final frontier of this oracle bit-for-bit.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from derzis_spark.config import (
    CrawlConfig, LABEL_PREDICATES, WARN_BY_STATUS)
from derzis_spark.functions.core import (
    Triple,
    canonicalize_url,
    extract_ntriples_block,
    extract_text,
    filter_quads,
    find_alternate_url,
    has_rdf_content,
    is_blank_node_id,
    matches_predicate_pattern,
    parse_ntriples,
    robots_allows,
    robots_crawl_delay,
    url_origin,
)


@dataclass
class Path:
    seed: str
    head_url: str | None      # None for literal heads
    head_kind: str            # url | literal
    head_key: str             # head_url or literal object_key
    nodes: tuple[str, ...]
    predicates: tuple[str, ...]
    status: str               # active | deleted
    created_round: int
    seq: int
    triple_keys: frozenset = frozenset()
    #: endpoint-path fields (models/src/Path/EndpointPath.ts:128-140):
    #: ptype 'endpoint' paths are unique per head and carry
    #: shortestPathLength + per-seed min distances instead of the
    #: node/predicate chains of traversal paths
    ptype: str = "traversal"
    spl: int = 0
    seed_paths: tuple = ()    # sorted ((seed, min_length), ...)

    @property
    def length(self) -> int:
        """Non-blank node count (models/src/Path/TraversalPath.ts:43-44)."""
        return sum(1 for n in self.nodes if not is_blank_node_id(n))

    @property
    def effective_length(self) -> int:
        """The priority-key length: shortestPathLength for endpoint
        paths (process-paths.ts:691-694), node count for traversal."""
        return self.spl if self.ptype == "endpoint" else self.length

    def priority(self) -> tuple:
        return (self.effective_length, self.created_round, self.seq)


@dataclass
class Domain:
    origin: str
    status: str = "unvisited"   # unvisited | ready | error
    robots_status: str | None = None
    robots_txt: str = ""
    crawl_delay: int = 1
    next_allowed: int = 0
    #: error-type counters (Domain.ts:45-58 WarningsClass + the
    #: E_RESOURCE_ISSUE counter Resource.ts:253 increments even though
    #: the reference schema omits it)
    warnings: dict = field(default_factory=dict)
    #: ring of the last 10 warning types ($slice: -10, Domain.ts:44,
    #: Resource.ts:236-266)
    last_warnings: tuple = ()


@dataclass
class TraceEntry:
    round: int
    seq: int
    url: str
    origin: str
    status: str  # done | error:<type>


@dataclass
class CrawlResult:
    trace: list[TraceEntry]
    resources: dict        # url -> {"origin", "status"}
    domains: dict          # origin -> Domain
    triples: dict          # key -> {"triple": Triple, "sources": set}
    paths: list            # all Path objects (active + deleted)
    proc_triples: set      # triple keys that extended a path
    proc_done_resources: set  # sources (at extension time) of those
    rounds: int


def triple_key(t: Triple) -> tuple:
    return (t.subject, t.predicate, t.object_kind, t.object_value,
            t.object_datatype or "", t.object_language or "")


class Oracle:
    def __init__(self, pages: dict, robots: dict, seeds: list[str],
                 config: CrawlConfig | None = None):
        """pages: url -> (html_bytes, text, lang);
        robots: origin -> (status, robots_txt); seeds: url list."""
        self.cfg = config or CrawlConfig()
        self.pages = pages
        self.robots = robots
        self.trace: list[TraceEntry] = []
        self.resources: dict[str, dict] = {}
        self.domains: dict[str, Domain] = {}
        self.triples: dict[tuple, dict] = {}
        self.paths: list[Path] = []
        self.proc_triples: set[tuple] = set()
        self.proc_done_resources: set[str] = set()
        self._seq = 0
        self._rnd = 0  # persists across run() calls (continue semantics)

        # seed bootstrap (models/src/Resource.ts:306-331,339-507)
        seen: set[str] = set()
        for raw in seeds:
            url = canonicalize_url(raw)
            if url is None or url in seen:
                continue
            seen.add(url)
            self._add_resource(url)
            if self.cfg.path_type == "endpoint":
                # endpoint seed path: shortestPathLength=1,
                # seedPaths=[{seed,1}] (Resource.ts:339-507)
                self.paths.append(Path(
                    seed="", head_url=url, head_kind="url", head_key=url,
                    nodes=(), predicates=(), status="active",
                    created_round=0, seq=self._next_seq(),
                    ptype="endpoint", spl=1, seed_paths=((url, 1),),
                ))
            else:
                self.paths.append(Path(
                    seed=url, head_url=url, head_kind="url", head_key=url,
                    nodes=(url,), predicates=(), status="active",
                    created_round=0, seq=self._next_seq(),
                ))

    # ------------------------------------------------------------------
    def _record_proc_triple(self, tkey: tuple) -> None:
        """processTriples + processDoneResources ledgers: the triple
        that extended a path, and its sources AS OF extension time
        (insertProcTriples / insertProcDoneRes, the triples→sources→
        resources provenance chain, process-paths.ts:874-977). Sources
        added to the triple later do NOT retroactively appear."""
        self.proc_triples.add(tkey)
        rec = self.triples.get(tkey)
        if rec:
            self.proc_done_resources.update(rec["sources"])

    def _next_seq(self) -> int:
        s = self._seq
        self._seq += 1
        return s

    def _warn(self, d: Domain, err_type: str) -> None:
        """Increment a domain warning counter + push the last-warnings
        ring (Resource.ts:232-266 / Domain.ts:1026-1049). Status→type
        mapping for the round model: mime/too_many_redirects →
        E_RESOURCE_ISSUE (unsupported_mime_type / too_many_redirects,
        Resource.ts:247-258); not_found and robots-disallowed →
        E_UNKNOWN (the else branch, Resource.ts:259-266 —
        RobotsForbiddenError carries no mapped errorType); robots
        host_not_found → E_DOMAIN_NOT_FOUND (Domain.ts:1026-1049)."""
        d.warnings[err_type] = d.warnings.get(err_type, 0) + 1
        d.last_warnings = (d.last_warnings + (err_type,))[-10:]

    _WARN_BY_STATUS = WARN_BY_STATUS

    def _add_resource(self, url: str) -> None:
        if url in self.resources:
            return
        origin = url_origin(url)
        self.resources[url] = {"origin": origin, "status": "unvisited",
                               "crawl_round": None, "crawl_counter": None}
        if origin not in self.domains:
            self.domains[origin] = Domain(
                origin=origin, crawl_delay=self.cfg.default_crawl_delay)

    # ------------------------------------------------------------------
    # eligibility (SURVEY.md §2.2 frontier filters)
    # ------------------------------------------------------------------
    def _path_base_eligible(self, p: Path) -> bool:
        return (
            p.status == "active"
            and p.head_kind == "url"
            and self.resources.get(p.head_url, {}).get("status") == "unvisited"
            and p.effective_length < self.cfg.max_path_length
            and len(p.predicates) <= self.cfg.max_path_props
            and self._step_query_ok(p)
        )

    def _step_query_ok(self, p: Path) -> bool:
        """Scheduling-side predicate-limitation filters
        (genTraversalPathQuery, process-paths.ts:791-866): past rules
        apply regardless of fullness and admit no label exemption; the
        future rules only bind FULL paths (count == maxPathProps, since
        extension can then only reuse an existing predicate). The
        reference's Mongo query matches limitation strings exactly while
        its per-triple check uses the pattern matcher
        (process-utils.ts:1-34) — this engine unifies both layers on
        the pattern semantics (documented deviation: regex/substring
        limitations filter scheduling too, instead of silently not
        matching in the query)."""
        lims = self.cfg.pred_limitations
        if not lims or p.ptype == "endpoint":
            return True
        req_past = [l.predicate for l in lims if "require-past" in l.lims]
        dis_past = [l.predicate for l in lims if "disallow-past" in l.lims]
        req_future = [l.predicate for l in lims if "require-future" in l.lims]
        dis_future = [l.predicate for l in lims
                      if "disallow-future" in l.lims]
        elems = p.predicates
        if (req_future or dis_future) and len(elems) >= self.cfg.max_path_props:
            if req_future:
                if not any(matches_predicate_pattern(pat, q)
                           for pat in req_future for q in elems):
                    return False
            elif not any(
                not any(matches_predicate_pattern(pat, q)
                        for pat in dis_future)
                for q in elems
            ):
                return False
        if dis_past and any(
            matches_predicate_pattern(pat, q)
            for pat in dis_past for q in elems
        ):
            return False
        if req_past and not all(
            any(matches_predicate_pattern(pat, q) for pat in req_past)
            for q in elems
        ):
            return False
        return True

    def _robots_candidates(self) -> list[str]:
        """Unvisited domains with ≥1 eligible path, by best path priority."""
        best: dict[str, tuple] = {}
        for p in self.paths:
            if not self._path_base_eligible(p):
                continue
            origin = self.resources[p.head_url]["origin"]
            d = self.domains[origin]
            if d.status != "unvisited":
                continue
            pr = p.priority()
            if origin not in best or pr < best[origin]:
                best[origin] = pr
        return [o for o, _ in sorted(best.items(), key=lambda kv: (kv[1], kv[0]))]

    def _crawl_schedule(self, rnd: int) -> list[tuple[str, str]]:
        """Scheduled (url, origin) for round, in global priority order."""
        best: dict[str, tuple] = {}
        url_origin_map: dict[str, str] = {}
        for p in self.paths:
            if not self._path_base_eligible(p):
                continue
            origin = self.resources[p.head_url]["origin"]
            d = self.domains[origin]
            if d.status != "ready" or d.next_allowed > rnd:
                continue
            pr = p.priority()
            if p.head_url not in best or pr < best[p.head_url]:
                best[p.head_url] = pr
                url_origin_map[p.head_url] = origin
        # per-domain top-k (row_number over (priority, url) per origin)
        by_domain: dict[str, list] = {}
        for url, pr in best.items():
            by_domain.setdefault(url_origin_map[url], []).append((pr, url))
        chosen: list[tuple[tuple, str, str]] = []
        for origin, items in by_domain.items():
            items.sort()
            for pr, url in items[: self.cfg.resources_per_domain]:
                chosen.append((pr, url, origin))
        chosen.sort()
        if self.cfg.round_budget_cap is not None:
            chosen = chosen[: self.cfg.round_budget_cap]
        if self.cfg.round_domain_limit is not None:
            kept_domains: list[str] = []
            for _, _, origin in chosen:
                if origin not in kept_domains:
                    kept_domains.append(origin)
            allowed = set(kept_domains[: self.cfg.round_domain_limit])
            chosen = [c for c in chosen if c[2] in allowed]
        return [(url, origin) for _, url, origin in chosen]

    # ------------------------------------------------------------------
    # predicate limitations (genTraversalPathQuery semantics,
    # models/src/Process/process-paths.ts:791-866; per-triple check
    # models/src/Path/TraversalPath.ts:451-537) — label preds exempt
    # ------------------------------------------------------------------
    def _pred_allowed(self, parent: Path, predicate: str) -> bool:
        """Per-extension check (isExtensionAllowed,
        TraversalPath.ts:451-537): rdfs:label/comment candidates are
        exempt from ALL limitations (:467-477); other candidates must
        pass future constraints and the path's past constraints. The
        SCHEDULING-side filters (genTraversalPathQuery) live in
        `_step_query_ok` — a path failing them doesn't justify fetching
        its head, but still receives post-fetch extensions through the
        headUrl query, which carries no predicate filters
        (queryTraversalPathsForHeadUrl, process-paths.ts:1305-1316)."""
        if predicate in LABEL_PREDICATES:
            return True
        lims = self.cfg.pred_limitations
        if not lims:
            return True
        req_future = [l.predicate for l in lims if "require-future" in l.lims]
        dis_future = [l.predicate for l in lims if "disallow-future" in l.lims]
        req_past = [l.predicate for l in lims if "require-past" in l.lims]
        dis_past = [l.predicate for l in lims if "disallow-past" in l.lims]
        if any(matches_predicate_pattern(pat, predicate) for pat in dis_future):
            return False
        if req_future and not any(
            matches_predicate_pattern(pat, predicate) for pat in req_future
        ):
            return False
        past = [q for q in parent.predicates if q not in LABEL_PREDICATES]
        if dis_past and any(
            matches_predicate_pattern(pat, q) for pat in dis_past for q in past
        ):
            return False
        if req_past and not all(
            any(matches_predicate_pattern(pat, q) for pat in req_past)
            for q in past
        ):
            return False
        return True

    def _direction_ok(self, predicate: str, head_is_subject: bool,
                      bf: dict[str, tuple[int, int]]) -> bool:
        """Branch-factor direction filter (common/src/lib/direction-ok.ts:15-33)."""
        if not self.cfg.follow_direction:
            return True
        subj, obj = bf.get(predicate, (0, 0))
        if obj == 0 or subj == 0:
            return True
        ratio = subj / obj
        if ratio >= self.cfg.bf_neutral_high:
            return head_is_subject
        if ratio <= self.cfg.bf_neutral_low:
            return not head_is_subject
        return True

    def _branch_factors(self) -> dict[str, tuple[int, int]]:
        """Per-predicate (distinct subjects, distinct objects) over all
        triples (models/src/Process/process-metrics.ts:122-145)."""
        subs: dict[str, set] = {}
        objs: dict[str, set] = {}
        for key in self.triples:
            s, p, kind, val = key[0], key[1], key[2], key[3]
            subs.setdefault(p, set()).add(s)
            objs.setdefault(p, set()).add(val if kind != "literal" else key[3:])
        return {p: (len(subs[p]), len(objs.get(p, set()))) for p in subs}

    # ------------------------------------------------------------------
    # path extension (models/src/Path/TraversalPath.ts:219-399)
    # ------------------------------------------------------------------
    def _candidates_for_head(self, head: str) -> list[tuple]:
        """(sortkey, triple_key, head_is_subject, node_kind, node_value)
        per candidate; deduped per (predicate, node_key) keep-first."""
        cands = []
        for key, rec in self.triples.items():
            t: Triple = rec["triple"]
            if t.subject == head:
                if t.object_kind == "uri" and t.object_value == head:
                    continue  # self-loop (TraversalPath.ts:408-449)
                node_kind = t.object_kind
                node_value = t.object_key()
                cands.append(((t.predicate, node_value, 0), key, True,
                              node_kind, t.object_value))
            if t.object_kind == "uri" and t.object_value == head \
                    and t.subject != head:
                cands.append(((t.predicate, t.subject, 1), key, False,
                              "uri", t.subject))
        cands.sort(key=lambda c: c[0])
        seen: set[tuple] = set()
        out = []
        for c in cands:
            dedup_key = (c[0][0], c[0][1])  # (predicate, node_key)
            if dedup_key in seen:
                continue
            seen.add(dedup_key)
            out.append(c)
        return out

    def _extend_parent(self, parent: Path, rnd: int,
                       bf: dict) -> list[Path]:
        children: list[Path] = []
        head = parent.head_url
        for (pred, node_key, _dir), tkey, head_is_subj, node_kind, node_value \
                in self._candidates_for_head(head):
            if tkey in parent.triple_keys:
                continue
            if pred == head:
                continue  # predicate == head.url cycle rule
            if not self._pred_allowed(parent, pred):
                continue
            if not self._direction_ok(pred, head_is_subj, bf):
                continue
            new_preds = parent.predicates if pred in parent.predicates \
                else parent.predicates + (pred,)
            if len(new_preds) > self.cfg.max_path_props:
                continue
            if node_kind == "literal":
                child = Path(
                    seed=parent.seed, head_url=None, head_kind="literal",
                    head_key=node_key, nodes=parent.nodes,
                    predicates=new_preds, status="active",
                    created_round=rnd, seq=self._next_seq(),
                    triple_keys=parent.triple_keys | {tkey},
                )
                children.append(child)
                if pred in LABEL_PREDICATES:
                    self._record_proc_triple(tkey)
                continue
            if node_kind == "blank":
                if not self.cfg.allow_blank_nodes:
                    continue
                # blank-node 2-hop chaining (blank-node-utils.ts:21-38):
                # the blank id becomes a non-counted node with a
                # non-fetchable head; follow-up extension happens in the
                # within-round cascade via triples whose subject is the
                # (namespaced) blank id.
                node = node_value
                head_kind = "blank"
            else:
                node_c = canonicalize_url(node_value)
                if node_c is None:
                    continue  # non-http(s) URI: not a crawlable head
                node = node_c
                head_kind = "url"
            if node in parent.nodes:
                continue  # cycle (TraversalPath.ts:408-449)
            new_nodes = parent.nodes + (node,)
            new_len = sum(1 for n in new_nodes if not is_blank_node_id(n))
            if new_len > self.cfg.max_path_length:
                continue  # out of bounds (TraversalPath.ts:539-545)
            child = Path(
                seed=parent.seed, head_url=node, head_kind=head_kind,
                head_key=node, nodes=new_nodes, predicates=new_preds,
                status="active", created_round=rnd, seq=self._next_seq(),
                triple_keys=parent.triple_keys | {tkey},
            )
            children.append(child)
            self._record_proc_triple(tkey)
        if children:
            parent.status = "deleted"
        return children

    def _endpoint_pred_allowed(self, parent: Path, predicate: str) -> bool:
        """isExtensionAllowed (EndpointPath.ts:160-190): label preds
        exempt; only FUTURE limitations apply (endpoint paths track no
        predicate history); with limitations present, a parent at
        spl >= maxPathLength is blocked."""
        lims = self.cfg.pred_limitations
        if not lims:
            return True
        if parent.spl >= self.cfg.max_path_length:
            return False
        if predicate in LABEL_PREDICATES:
            return True
        req_future = [l.predicate for l in lims if "require-future" in l.lims]
        dis_future = [l.predicate for l in lims if "disallow-future" in l.lims]
        if req_future and not any(
            matches_predicate_pattern(pat, predicate) for pat in req_future
        ):
            return False
        if any(matches_predicate_pattern(pat, predicate) for pat in dis_future):
            return False
        return True

    def _direction_ok_neither(self, predicate: str,
                              bf: dict[str, tuple[int, int]]) -> bool:
        """Direction check when the head is neither subject nor object
        of the triple (blank-chained outgoings): only neutral-zone or
        unknown predicates pass (direction-ok.ts:15-33)."""
        if not self.cfg.follow_direction:
            return True
        subj, obj = bf.get(predicate, (0, 0))
        if obj == 0 or subj == 0:
            return True
        ratio = subj / obj
        return self.cfg.bf_neutral_low < ratio < self.cfg.bf_neutral_high

    def _endpoint_blank_chain(self, parent: Path, blank_id: str,
                              url_cands: dict, lit_cands: dict,
                              bf: dict) -> bool:
        """Blank 2-hop for endpoint paths (EndpointPath.ts:270-337):
        outgoing triples of ``blank_id`` extend the parent at
        unincremented distance. Returns True if any candidate was
        produced."""
        produced = False
        p_seeds = dict(parent.seed_paths)
        outs = []
        for key, rec in self.triples.items():
            t: Triple = rec["triple"]
            if t.subject != blank_id or t.object_kind == "blank":
                continue
            outs.append(((t.predicate, t.object_key()), t, key))
        outs.sort(key=lambda o: o[0])
        for (pred2, okey), t, tkey in outs:
            if pred2 == parent.head_url:
                continue
            if not self._endpoint_pred_allowed(parent, pred2):
                continue
            dist = parent.spl  # blank node hop doesn't count
            seeds = dict(p_seeds)
            if t.object_kind == "literal":
                c = lit_cands.setdefault(okey, {"dist": dist, "seeds": {}})
            else:
                if not self._direction_ok_neither(pred2, bf):
                    continue
                node_c = canonicalize_url(t.object_value)
                if node_c is None:
                    continue
                if node_c in p_seeds:
                    continue  # seed-cycle
                c = url_cands.setdefault(
                    node_c, {"dist": dist, "seeds": {}})
                self._record_proc_triple(tkey)
            c["dist"] = min(c["dist"], dist)
            for s, m in seeds.items():
                c["seeds"][s] = min(c["seeds"].get(s, m), m)
            produced = True
        return produced

    def _extend_round_endpoint(self, fetched_urls: list[str],
                               rnd: int) -> None:
        """Endpoint-path extension (EndpointPath.ts:216-372): wave
        candidates are merged BY HEAD — an existing endpoint path for a
        head absorbs new seed distances by min (processUrlCandidate,
        EndpointPath.ts:521-608); unseen heads create one path each.
        Deterministic deviations from the reference's DB-racy batch
        behavior, mirrored exactly by the engine: candidates from all
        wave parents merge globally before path creation; literal
        candidates are deduped per wave; a parent counts as extended if
        it produced >=1 valid candidate. Blank-node chaining follows
        EndpointPath.ts:270-337: outgoing triples of a blank object
        extend at UNINCREMENTED distance ("blank node hop doesn't
        count"), and since the parent head is neither subject nor
        object of the outgoing triple, the direction filter admits only
        neutral-zone/unknown predicates (direction-ok.ts:15-33)."""
        worklist = [
            p for p in self.paths
            if p.status == "active" and p.head_kind == "url"
            and p.head_url in fetched_urls and p.ptype == "endpoint"
        ]
        guard = 0
        while worklist and guard < 100:
            guard += 1
            bf = self._branch_factors() if self.cfg.follow_direction else {}
            worklist.sort(key=lambda p: p.priority())
            url_cands: dict[str, dict] = {}
            lit_cands: dict[str, dict] = {}
            extended: list[Path] = []
            for parent in worklist:
                if parent.spl >= self.cfg.max_path_length:
                    continue  # tripleIsOutOfBounds (EndpointPath.ts:186-188)
                produced = False
                p_seeds = dict(parent.seed_paths)
                for (pred, node_key, _d), tkey, head_is_subj, node_kind, \
                        node_value in self._candidates_for_head(
                            parent.head_url):
                    if pred == parent.head_url:
                        continue  # isExtensionValid predicate==head rule
                    if not self._endpoint_pred_allowed(parent, pred):
                        continue
                    if node_kind == "blank":
                        if not self.cfg.allow_blank_nodes:
                            continue
                        if self._endpoint_blank_chain(
                                parent, node_value, url_cands, lit_cands,
                                bf):
                            produced = True
                        continue
                    dist = parent.spl + 1
                    seeds = {s: m + 1 for s, m in p_seeds.items()}
                    if node_kind == "literal":
                        c = lit_cands.setdefault(
                            node_key, {"dist": dist, "seeds": {}})
                        c["dist"] = min(c["dist"], dist)
                        for s, m in seeds.items():
                            c["seeds"][s] = min(c["seeds"].get(s, m), m)
                        if pred in LABEL_PREDICATES:
                            self._record_proc_triple(tkey)
                        produced = True
                        continue
                    if not self._direction_ok(pred, head_is_subj, bf):
                        continue
                    node_c = canonicalize_url(node_value)
                    if node_c is None:
                        continue
                    if node_c in p_seeds:
                        continue  # seed-cycle (EndpointPath.ts:405-408)
                    c = url_cands.setdefault(
                        node_c, {"dist": dist, "seeds": {}})
                    c["dist"] = min(c["dist"], dist)
                    for s, m in seeds.items():
                        c["seeds"][s] = min(c["seeds"].get(s, m), m)
                    self._record_proc_triple(tkey)
                    produced = True
                if produced:
                    extended.append(parent)
            existing = {
                p.head_url: p for p in self.paths
                if p.ptype == "endpoint" and p.head_kind == "url"
            }
            new_paths: list[Path] = []
            for head in sorted(url_cands,
                               key=lambda h: (url_cands[h]["dist"], h)):
                c = url_cands[head]
                ex = existing.get(head)
                if ex is not None:
                    merged = dict(ex.seed_paths)
                    for s, m in c["seeds"].items():
                        merged[s] = min(merged.get(s, m), m)
                    ex.seed_paths = tuple(sorted(merged.items()))
                    ex.spl = min(ex.spl, c["dist"])
                else:
                    if head not in self.resources:
                        self._add_resource(head)
                    p = Path(
                        seed="", head_url=head, head_kind="url",
                        head_key=head, nodes=(), predicates=(),
                        status="active", created_round=rnd,
                        seq=self._next_seq(), ptype="endpoint",
                        spl=c["dist"],
                        seed_paths=tuple(sorted(c["seeds"].items())))
                    self.paths.append(p)
                    new_paths.append(p)
            for key in sorted(lit_cands):
                c = lit_cands[key]
                self.paths.append(Path(
                    seed="", head_url=None, head_kind="literal",
                    head_key=key, nodes=(), predicates=(),
                    status="active", created_round=rnd,
                    seq=self._next_seq(), ptype="endpoint",
                    spl=c["dist"],
                    seed_paths=tuple(sorted(c["seeds"].items()))))
            for parent in extended:
                parent.status = "deleted"
            worklist = [
                p for p in new_paths
                if self.resources.get(p.head_url, {}).get("status") == "done"
            ]

    def convert_to_endpoint(self) -> None:
        """convertToEndpointPaths (process-paths.ts:1640-1716): every
        active traversal path becomes an endpoint candidate — same head,
        shortestPathLength = node count, seedPaths = {seed: length}
        (convertToEndpointSkeletons, process-paths.ts:1698-1716) —
        min-merged by head with any existing endpoint paths; all
        traversal paths are then deleted and the crawl continues under
        endpoint semantics. Deterministic simplification (mirrored in
        the engine): conversion is one global merge; the reference's
        interleaved re-extension of done heads during conversion is
        left to the subsequent run(). Blank-head paths are deleted
        without conversion."""
        from dataclasses import replace as dc_replace

        url_c: dict[str, dict] = {}
        lit_c: dict[str, dict] = {}
        for p in self.paths:
            if p.status != "active" or p.ptype != "traversal":
                continue
            p.status = "deleted"
            if p.head_kind == "url":
                c = url_c.setdefault(
                    p.head_url, {"dist": p.length, "seeds": {}})
            elif p.head_kind == "literal":
                c = lit_c.setdefault(
                    p.head_key, {"dist": p.length, "seeds": {}})
            else:
                continue  # blank heads: deleted, not converted
            c["dist"] = min(c["dist"], p.length)
            c["seeds"][p.seed] = min(
                c["seeds"].get(p.seed, p.length), p.length)
        existing = {
            p.head_url: p for p in self.paths
            if p.ptype == "endpoint" and p.head_kind == "url"
        }
        for head in sorted(url_c, key=lambda h: (url_c[h]["dist"], h)):
            c = url_c[head]
            ex = existing.get(head)
            if ex is not None:
                merged = dict(ex.seed_paths)
                for s, m in c["seeds"].items():
                    merged[s] = min(merged.get(s, m), m)
                ex.seed_paths = tuple(sorted(merged.items()))
                ex.spl = min(ex.spl, c["dist"])
            else:
                self.paths.append(Path(
                    seed="", head_url=head, head_kind="url",
                    head_key=head, nodes=(), predicates=(),
                    status="active", created_round=self._rnd,
                    seq=self._next_seq(), ptype="endpoint",
                    spl=c["dist"],
                    seed_paths=tuple(sorted(c["seeds"].items()))))
        for key in sorted(lit_c):
            c = lit_c[key]
            self.paths.append(Path(
                seed="", head_url=None, head_kind="literal",
                head_key=key, nodes=(), predicates=(),
                status="active", created_round=self._rnd,
                seq=self._next_seq(), ptype="endpoint",
                spl=c["dist"],
                seed_paths=tuple(sorted(c["seeds"].items()))))
        self.cfg = dc_replace(self.cfg, path_type="endpoint")

    def _extend_round(self, fetched_urls: list[str], rnd: int) -> None:
        """Extend paths whose head was fetched this round, cascading to
        new paths whose heads are already fetched (within-round fixpoint)."""
        if self.cfg.path_type == "endpoint":
            return self._extend_round_endpoint(fetched_urls, rnd)
        worklist = [
            p for p in self.paths
            if p.status == "active" and p.head_kind == "url"
            and p.head_url in fetched_urls
        ]
        guard = 0
        while worklist and guard < 100:
            guard += 1
            bf = self._branch_factors() if self.cfg.follow_direction else {}
            worklist.sort(key=lambda p: p.priority())
            next_wave: list[Path] = []
            for parent in worklist:
                children = self._extend_parent(parent, rnd, bf)
                for c in children:
                    self.paths.append(c)
                    if c.head_kind == "blank":
                        # blank heads chain immediately (2-hop join)
                        next_wave.append(c)
                    elif c.head_kind == "url":
                        if c.head_url in self.resources:
                            if self.resources[c.head_url]["status"] == "done":
                                next_wave.append(c)
                        else:
                            self._add_resource(c.head_url)
            worklist = [c for c in next_wave if c.status == "active"]

    # ------------------------------------------------------------------
    def reset_errored_states(self) -> None:
        """Error resets (resetErrors step flag, Process.ts:562-664):
        errored resources revert to unvisited so they are re-schedulable
        and errored (host-not-found) domains revert to unvisited so
        robots are re-checked. Seen-set membership is unchanged — no URL
        is deleted, so the Bloom filter stays exact (a true deletion
        semantics would use operators/seen_set.py's CuckooFilter)."""
        for rec in self.resources.values():
            if rec["status"] == "error":
                rec["status"] = "unvisited"
        for d in self.domains.values():
            if d.status == "error":
                d.status = "unvisited"
                d.robots_status = None
                d.robots_txt = ""
                d.crawl_delay = self.cfg.default_crawl_delay
                d.next_allowed = 0

    def start_step(self, seeds=(), config: CrawlConfig | None = None,
                   reset_errors: bool = False,
                   convert_to_endpoint: bool = False) -> None:
        """Begin a new process step (Process.startNext,
        models/src/Process/Process.ts:412-493): optionally reset
        errored states, re-extend active paths whose heads are already
        done under the NEW step limits (extendPaths headStatus='done' —
        this is what lets a raised max_path_length grow previously
        bounded paths), optionally convert to endpoint mode, then
        insert the step's seeds (Resource.insertSeeds: traversal seeds
        always create a fresh length-1 path; endpoint seeds only when
        no endpoint path exists for that head, the $setOnInsert upsert
        Resource.ts:345-420)."""
        if config is not None:
            self.cfg = config
        if reset_errors:
            self.reset_errored_states()
        if convert_to_endpoint:
            self.convert_to_endpoint()
        else:
            done_heads = sorted({
                p.head_url for p in self.paths
                if p.status == "active" and p.head_kind == "url"
                and self.resources.get(p.head_url, {}).get("status")
                == "done"})
            if done_heads:
                if self.cfg.path_type == "endpoint":
                    self._extend_round_endpoint(done_heads, self._rnd)
                else:
                    self._extend_round(done_heads, self._rnd)
        ep_heads = {p.head_url for p in self.paths
                    if p.ptype == "endpoint" and p.head_kind == "url"}
        seen: set[str] = set()
        for raw in seeds:
            url = canonicalize_url(raw)
            if url is None or url in seen:
                continue
            seen.add(url)
            self._add_resource(url)
            if self.cfg.path_type == "endpoint":
                if url in ep_heads:
                    continue
                self.paths.append(Path(
                    seed="", head_url=url, head_kind="url", head_key=url,
                    nodes=(), predicates=(), status="active",
                    created_round=self._rnd, seq=self._next_seq(),
                    ptype="endpoint", spl=1, seed_paths=((url, 1),),
                ))
                ep_heads.add(url)
            else:
                self.paths.append(Path(
                    seed=url, head_url=url, head_kind="url", head_key=url,
                    nodes=(url,), predicates=(), status="active",
                    created_round=self._rnd, seq=self._next_seq(),
                ))

    def _resolve_redirects(self, html) -> tuple[str, bytes | None]:
        """Follow RDF alternate links until accepted content is found
        (handleHttpResponse recursion, Worker.ts:744-766): no alternate
        → MIME error; > max_redirects hops → too-many-redirects; a hop
        whose target has no pages row → not_found."""
        redirect = 0
        cur = html
        while not has_rdf_content(cur):
            alt = find_alternate_url(cur)
            if alt is None:
                return ("error:mime", None)
            if redirect >= self.cfg.max_redirects:
                return ("error:too_many_redirects", None)
            page = self.pages.get(alt)
            if page is None:
                return ("error:not_found", None)
            cur = page[0]
            redirect += 1
        return ("ok", cur)

    def run(self, max_rounds: int | None = None) -> CrawlResult:
        cap = max_rounds if max_rounds is not None else self.cfg.max_rounds
        rnd = self._rnd
        while rnd < cap:
            rnd += 1
            # Phase A — robots checks for unvisited domains
            robots_todo = self._robots_candidates()
            for origin in robots_todo:
                d = self.domains[origin]
                status, txt = self.robots.get(origin, ("not_found", ""))
                d.robots_status = status
                if status == "host_not_found":
                    d.status = "error"
                    self._warn(d, "E_DOMAIN_NOT_FOUND")
                    continue
                d.robots_txt = txt if status == "ok" else ""
                delay = None
                if status == "ok":
                    delay = robots_crawl_delay(txt, self.cfg.user_agent)
                d.crawl_delay = (
                    int(delay) if delay is not None
                    else self.cfg.default_crawl_delay
                )
                d.status = "ready"
                d.next_allowed = rnd + d.crawl_delay

            # Phase B — crawl
            schedule = self._crawl_schedule(rnd)
            if not robots_todo and not schedule:
                rnd -= 1
                break
            fetched: list[str] = []
            new_triples_this_round: list[tuple[str, list[Triple]]] = []
            crawl_counters: dict[str, int] = {}
            for seq, (url, origin) in enumerate(schedule):
                d = self.domains[origin]
                res = self.resources[url]
                # crawlId stamp (Resource.ts:35-41; Worker.ts:395-413):
                # every scheduled resource consumes a per-domain-crawl
                # counter BEFORE the robots gate; domainTs ≡ the round
                c = crawl_counters.get(origin, 0)
                crawl_counters[origin] = c + 1
                res["crawl_round"] = rnd
                res["crawl_counter"] = c
                if not robots_allows(d.robots_txt, url, self.cfg.user_agent):
                    res["status"] = "error"
                    self._warn(d, self._WARN_BY_STATUS["error:disallowed"])
                    self.trace.append(
                        TraceEntry(rnd, seq, url, origin, "error:disallowed"))
                    continue
                d.next_allowed = rnd + d.crawl_delay
                # triple-cache fetch-skip (Worker.getTriplesFromCache,
                # Worker.ts:340-379, used :425-440): a URL already in
                # the store's source sets skips the fetch; its cached
                # triples are re-submitted verbatim (store unchanged —
                # sources already contain url) and still feed discovery
                # + extension. Politeness was charged above, matching
                # markAsCrawled → setNextCrawlAllowed (Resource.ts:273).
                cached = [rec["triple"] for rec in self.triples.values()
                          if url in rec["sources"]]
                if cached:
                    new_triples_this_round.append((url, cached))
                    res["status"] = "done"
                    fetched.append(url)
                    self.trace.append(
                        TraceEntry(rnd, seq, url, origin, "done"))
                    continue
                page = self.pages.get(url)
                if page is None:
                    res["status"] = "error"
                    self._warn(d, self._WARN_BY_STATUS["error:not_found"])
                    self.trace.append(
                        TraceEntry(rnd, seq, url, origin, "error:not_found"))
                    continue
                html, _text, _lang = page
                extract_text(html)  # byte-identical invariant checked in tests
                # alternate-URL redirect resolution on wrong MIME
                # (Worker.ts:744-766, worker-utils.ts:122-160)
                fstatus, rdf_html = self._resolve_redirects(html)
                if fstatus != "ok":
                    res["status"] = "error"
                    self._warn(d, self._WARN_BY_STATUS.get(
                        fstatus, "E_UNKNOWN"))
                    self.trace.append(
                        TraceEntry(rnd, seq, url, origin, fstatus))
                    continue
                raw = parse_ntriples(extract_ntriples_block(rdf_html))
                quads = filter_quads(raw, url, self.cfg.allow_blank_nodes)
                for t in quads:
                    key = triple_key(t)
                    rec = self.triples.setdefault(
                        key, {"triple": t, "sources": set()})
                    rec["sources"].add(url)
                new_triples_this_round.append((url, quads))
                self.resources[url]["status"] = "done"
                fetched.append(url)
                self.trace.append(TraceEntry(rnd, seq, url, origin, "done"))

            # new-URL discovery (Resource.addFromTriples,
            # manager/src/lib/Manager.ts:352-410)
            for _src, quads in new_triples_this_round:
                for t in quads:
                    for node in (t.subject,
                                 t.object_value if t.object_kind == "uri"
                                 else None):
                        if node is None or is_blank_node_id(node):
                            continue
                        cu = canonicalize_url(node)
                        if cu is not None and cu not in self.resources:
                            self._add_resource(cu)

            # path extension
            self._extend_round(fetched, rnd)
        self._rnd = rnd
        return CrawlResult(
            trace=self.trace, resources=self.resources, domains=self.domains,
            triples=self.triples, paths=self.paths,
            proc_triples=self.proc_triples,
            proc_done_resources=self.proc_done_resources, rounds=rnd,
        )


def build_oracle_for_fixture(fx, config: CrawlConfig | None = None):
    pages = {u: (h, t, l) for u, h, t, l in
             zip(fx.urls, fx.html, fx.text, fx.lang)}
    robots = {o: (s, txt) for o, s, txt in
              zip(fx.robots_origin, fx.robots_status, fx.robots_txt)}
    return Oracle(pages, robots, fx.seeds, config)


def run_oracle_on_fixture(fx, config: CrawlConfig | None = None,
                          max_rounds: int | None = None) -> CrawlResult:
    return build_oracle_for_fixture(fx, config).run(max_rounds)
