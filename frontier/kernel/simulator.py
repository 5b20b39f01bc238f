"""Pure-Python crawl simulator — the behavioral oracle for the Spark
frontier (SURVEY.md §5.3 #3).

Semantics transcribed from the reference's merge pipeline
(merge.py:30-44: first-writer-wins seen-set membership) plus the
engine's documented scheduling rules, in order per round:

1. robots gate at frontier ENTRY: a disallowed URL never enters the
   frontier — it is recorded as blocked when first offered (seed or
   discovery) and never fetched or re-offered. Gate timing cannot
   change scheduled sets (the robots relation is fixed), and
   entry-gating is the O(new offers) form the Spark engine uses at
   scale.
2. politeness budget: per host, top ``budget`` URLs ordered by
   ``(priority, warc_ts, url_canon)`` are scheduled; the rest wait
3. fetch + parse: scheduled URLs become seen; their pages' outbound
   links are offered with priority = parent priority + 1 and the
   page's warc_ts. Rounds are ATOMIC batches: all fetches of a round
   happen "simultaneously", then offers merge deterministically — an
   already-seen or already-queued URL is never re-added, and when the
   same new URL is discovered from several pages in one round the
   minimum ``(priority, warc_ts)`` offer wins. Batch-atomic semantics
   (rather than sequential iteration order) is what makes the crawl
   reproducible at any parallelism — the Spark engine and this
   simulator implement the identical rule.

Single dict/list implementation, no Spark — runs in milliseconds so
the Spark-equivalence test stays cheap.
"""

from __future__ import annotations

from collections import defaultdict
from dataclasses import dataclass, field
from urllib.parse import urlsplit

from . import robots as krobots
from . import urlnorm


@dataclass
class SimResult:
    rounds: list[dict] = field(default_factory=list)
    seen: set = field(default_factory=set)       # fetched or attempted
    blocked: set = field(default_factory=set)    # robots-denied
    fetched_texts: dict = field(default_factory=dict)


def _path_of(canon: str) -> str:
    # path PLUS query (RFC 9309 §2.2.2) — mirrors the Spark gate's
    # extraction in schedule.apply_robots
    sp = urlsplit(canon)
    path = sp.path or "/"
    return path + ("?" + sp.query if sp.query else "")


def simulate(pages: dict, seeds: list, robots: dict,
             budget_per_host: int, max_rounds: int,
             robots_delay: dict | None = None,
             window_ms: int | None = None) -> SimResult:
    """
    pages:  canon_url -> (warc_ts_us, text_or_None, links: list[raw url])
    seeds:  list of (raw_url, priority, warc_ts_us)
    robots: host -> list of (pattern, allow) RFC 9309 rules
    robots_delay / window_ms: Crawl-delay-capped budgets — a host with
    delay d ms serves at most max(1, window_ms // d) fetches per round
    (schedule.politeness_cut's delay rule); hosts with no or zero
    delay keep the full budget.
    """

    def host_budget(host: str) -> int:
        if window_ms is None or not robots_delay:
            return budget_per_host
        d = robots_delay.get(host, 0)
        if d <= 0:
            return budget_per_host
        return min(budget_per_host, max(1, window_ms // d))
    result = SimResult()
    frontier: dict = {}  # canon -> (priority, warc_ts_us, canon)

    def gate(canon) -> bool:
        """True iff robots allow `canon` (entry-time gate)."""
        host = urlnorm.host_of(canon)
        rules = robots.get(host, [])
        return krobots.is_allowed(rules, _path_of(canon))

    def offer(raw_url, priority, ts):
        canon = urlnorm.canonicalize(raw_url)
        if canon is None or canon in result.seen \
                or canon in result.blocked or canon in frontier:
            return
        if not gate(canon):
            result.blocked.add(canon)
            return
        frontier[canon] = (priority, ts, canon)

    for raw, prio, ts in seeds:
        offer(raw, prio, ts)

    for round_no in range(max_rounds):
        if not frontier:
            break

        # 2. politeness budget
        by_host = defaultdict(list)
        for canon, key in frontier.items():
            by_host[urlnorm.host_of(canon)].append(key)
        per_host_order = {}
        scheduled = []
        for host in sorted(by_host):
            queue = [c for _, _, c in sorted(by_host[host])][:host_budget(host)]
            per_host_order[host] = queue
            scheduled.extend(queue)
        if not scheduled:
            break

        # 3. fetch + discover — batch-atomic: all scheduled become seen,
        # then all offers merge with min-(priority, warc_ts) per url
        batch = {canon: frontier.pop(canon) for canon in scheduled}
        result.seen.update(batch)
        offers: dict = {}
        for canon, (prio, _ts, _) in batch.items():
            page = pages.get(canon)
            if page is None:
                continue
            page_ts, text, links = page
            if text is not None:
                result.fetched_texts[canon] = text
            for link in links:
                child = urlnorm.canonicalize(link)
                if child is None or child in result.seen \
                        or child in result.blocked or child in frontier:
                    continue
                offer_key = (prio + 1, page_ts)
                if child not in offers or offer_key < offers[child]:
                    offers[child] = offer_key
        n_discovered = 0
        for child, (prio, ts) in offers.items():
            if gate(child):
                frontier[child] = (prio, ts, child)
                n_discovered += 1
            else:
                result.blocked.add(child)

        result.rounds.append({
            "round": round_no,
            "scheduled": sorted(scheduled),
            "per_host_order": per_host_order,
            "n_discovered": n_discovered,
        })
    return result
