"""Crawl-run configuration.

Mirrors the reference's StepClass / config defaults
(reference: models/src/Process/aux-classes.ts:73-137,
config/src/index.ts:44-47,62-76) re-expressed for a round-synchronous
engine: wall-clock politeness becomes a simulated round clock
(SURVEY.md §7.0), worker capacities collapse into per-round budgets.
"""

from __future__ import annotations

from dataclasses import dataclass, field


USER_AGENT = "derzis-spark"

#: predicates always allowed regardless of predicate limitations
#: (reference: models/src/Path/TraversalPath.ts — rdfs:label/comment exempt)
LABEL_PREDICATES = (
    "http://www.w3.org/2000/01/rdf-schema#label",
    "http://www.w3.org/2000/01/rdf-schema#comment",
)

#: fetch-status → domain warning counter (Resource.ts:232-266: mime /
#: too_many_redirects → E_RESOURCE_ISSUE; the else branch → E_UNKNOWN,
#: which also covers robots-disallowed since RobotsForbiddenError maps
#: to no listed errorType)
WARN_BY_STATUS = {
    "error:mime": "E_RESOURCE_ISSUE",
    "error:too_many_redirects": "E_RESOURCE_ISSUE",
    "error:not_found": "E_UNKNOWN",
    "error:disallowed": "E_UNKNOWN",
}


@dataclass(frozen=True)
class PredLimitation:
    """Predicate allow/deny rule (reference: aux-classes.ts:54-68).

    ``lims`` is a subset of
    {require-past, disallow-past, require-future, disallow-future}.
    ``predicate`` is matched per process-utils.ts:1-34: a ``/re/`` regex,
    a URL prefix, or a substring.
    """

    predicate: str
    lims: tuple[str, ...] = ()


@dataclass(frozen=True)
class CrawlConfig:
    #: max number of (non-blank) nodes on a path
    #: (reference default 2, config/src/index.ts:44-47)
    max_path_length: int = 2
    #: max number of *distinct* predicates on a path (reference default 1)
    max_path_props: int = 1
    #: politeness: default delay in *rounds* between crawls of one domain
    #: (reference: 1 s default, config/src/index.ts:76; round clock per
    #: SURVEY.md §7.0 — 1 round ≡ 1 second of simulated time)
    default_crawl_delay: int = 1
    #: per-round per-domain resource budget
    #: (reference: resourcesPerDomain, config/src/index.ts:62-74)
    resources_per_domain: int = 1
    #: cap on domains scheduled per round (None = all eligible;
    #: reference analog: aggregate worker capacity)
    round_domain_limit: int | None = None
    #: cap on total URLs scheduled per round (None = uncapped). Applied
    #: as a parallel top-k (orderBy+limit) over the priority-ranked
    #: admitted set BEFORE the driver collect, so a mega-frontier round
    #: can never materialize more than this many rows on the driver;
    #: URLs beyond the cap stay eligible for later rounds
    round_budget_cap: int | None = None
    #: allow blank-node objects (reference default false, config/src/index.ts:48)
    allow_blank_nodes: bool = False
    #: predicate limitations (reference: StepClass.predLimitations)
    pred_limitations: tuple[PredLimitation, ...] = ()
    #: follow-direction filter using predicate branch factors
    #: (reference: common/src/lib/direction-ok.ts:15-33)
    follow_direction: bool = False
    #: branch-factor neutral zone (reference: config/src/index.ts:25-32)
    bf_neutral_low: float = 0.83
    bf_neutral_high: float = 1.2
    #: traversal | endpoint (reference: config/src/index.ts:23)
    path_type: str = "traversal"
    #: max alternate-URL redirect hops per fetch
    #: (reference: http.domainCrawl.maxRedirects 5, Worker.ts:698,744)
    max_redirects: int = 5
    #: safety cap on rounds
    max_rounds: int = 1000
    #: key-count ceiling for EXPLICIT broadcast hints on round-sized
    #: join sides (triple-MERGE collision scan, cache-probe hit set,
    #: endpoint min-merge). Below it the hint skips a shuffle; above it
    #: the hint is dropped so the join shuffles on the (bucketed) key —
    #: an explicit hint would bypass AQE's size check and a mega-round
    #: (millions of URLs × ~30 triples) would blow the 8 GB broadcast
    #: hard limit
    broadcast_key_limit: int = 2_000_000
    #: tighter gate for the extension cascade's parents side: a parent
    #: row carries the path's nodes/predicates arrays (~1 KB/row vs the
    #: MERGE scans' bare key tuples), so the generic key gate would
    #: admit multi-GB broadcasts; 250k rows ≈ 250 MB keeps the wave
    #: join broadcast-shaped for normal waves and shuffles mega-waves
    wave_broadcast_limit: int = 250_000
    #: ceiling on the driver-side known-origin set (new-domain
    #: detection fast path). Below it, membership is a set lookup;
    #: past it the set is dropped and new origins are found with a
    #: batch-bounded anti-join against the domains table — a 10^8-
    #: domain crawl must not mirror the whole dimension on the driver
    origin_set_limit: int = 2_000_000
    #: ceiling on the distinct-predicate vocabulary collected to
    #: evaluate pred_limitations patterns driver-side (the fast path:
    #: match each distinct predicate ONCE, apply as literal isin
    #: sets). The probe is ``limit(n+1).collect()`` so the collect is
    #: hard-bounded; past the gate the patterns are evaluated by a
    #: vectorized pandas UDF per candidate row instead — a pathological
    #: vocabulary (generated predicate URIs, one per triple) must not
    #: materialize on the driver or as giant literal arrays in the plan
    pred_vocab_limit: int = 1_000_000
    #: use the Bloom-filter pre-pass for the seen-set anti-join
    use_bloom: bool = True
    #: expected seen-set capacity for sizing the Bloom filter
    bloom_capacity: int = 1_000_000
    bloom_fpp: float = 0.01
    #: capacity for the triple-key Bloom filter (MERGE collision
    #: pre-pass): triples outnumber URLs ~10-50×, so it gets its own
    #: sizing. A full filter only degrades fpp — every maybe-collision
    #: still goes through the exact store semi-join
    triple_bloom_capacity: int = 4_000_000
    user_agent: str = USER_AGENT

    def __post_init__(self) -> None:
        if self.path_type not in ("traversal", "endpoint"):
            raise ValueError(f"bad path_type: {self.path_type}")
        object.__setattr__(
            self, "pred_limitations", tuple(self.pred_limitations)
        )
