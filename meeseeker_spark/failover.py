"""Node failover / URL shuffle (SURVEY §2 S10).

Driver-side connection management for the streaming source connector —
never a plan operator. Mirrors the reference's semantics
(/root/reference/lib/meeseeker.rb:108-115,162-199):

- pick a random node from the chain's failover list minus the blacklist;
- a live-node report (the ``@fullnodeupdate`` account metadata on-chain)
  can supply fresher candidates, filtered to the right chain and again
  minus the blacklist;
- any error while probing a node blacklists it and re-samples;
- occasionally the whole blacklist is amnestied (the reference rolls
  ``rand(1..1000) == 13`` per shuffle) so transient outages don't
  permanently shrink the pool.

Hermetic differences: randomness is injected (seeded ``random.Random``)
so tests are deterministic, and the amnesty predicate is a counter-based
hook instead of a literal dice roll — same amortized behavior, testable.
"""

from __future__ import annotations

import random
import threading
from collections.abc import Callable, Iterable

DEFAULT_HIVE_FAILOVER_URLS = [
    "https://api.hive.blog",
    "https://api.openhive.network",
    "https://anyx.io",
    "https://rpc.ausbit.dev",
    "https://hived.emre.sh",
]

DEFAULT_STEEM_FAILOVER_URLS = [
    "https://api.steemit.com",
]


class NodePool:
    """Blacklist-aware node chooser with report refresh + amnesty."""

    def __init__(self, urls: Iterable[str], seed: int | None = None,
                 amnesty_every: int = 1000):
        self._seed_urls = list(dict.fromkeys(urls))
        if not self._seed_urls:
            raise ValueError("NodePool needs at least one URL")
        self._report_urls: list[str] = []
        self._rng = random.Random(seed)
        self._blacklist: set[str] = set()
        self._amnesty_every = amnesty_every
        self._shuffles = 0
        # one lock over every mutation and read-of-mutable state (r15
        # runtime review): the pool is driver-side shared state and
        # probe failures arrive on listener/supervision threads —
        # unsynchronized, a report_failure add racing _candidates'
        # set-comprehension raised "set changed size during iteration",
        # and an amnesty clear() could drop a just-added blacklist
        # entry (the dead node was immediately re-offered)
        self._lock = threading.Lock()

    @property
    def blacklist(self) -> frozenset[str]:
        with self._lock:
            return frozenset(self._blacklist)

    def _candidates(self) -> list[str]:
        # reported nodes are PREFERRED but the seed failover list stays
        # a permanent fallback (r15 review): the reference re-derives
        # from its static list on every shuffle and only samples the
        # report for the current pick (meeseeker.rb:167-190
        # `nodes.any? ? nodes.sample : failover_urls.sample`) — a pool
        # that REPLACED its urls with a 2-node report would re-offer
        # those two dead nodes forever once both blacklist.
        live = [u for u in self._report_urls if u not in self._blacklist]
        if not live:
            live = [u for u in self._seed_urls if u not in self._blacklist]
        # a fully-blacklisted pool resets rather than deadlocking — the
        # reference would loop erroring; bounded recovery is strictly better
        if not live:
            self._blacklist.clear()
            live = (list(self._report_urls) or list(self._seed_urls))
        return live

    def shuffle(self) -> str:
        """Pick the next node URL (meeseeker.rb:108-115): amortized
        amnesty, then uniform choice over non-blacklisted nodes."""
        with self._lock:
            self._shuffles += 1
            if self._amnesty_every \
                    and self._shuffles % self._amnesty_every == 0:
                self._blacklist.clear()
            return self._rng.choice(self._candidates())

    def report_failure(self, url: str) -> str:
        """Blacklist a misbehaving node and re-sample
        (meeseeker.rb:193-198)."""
        with self._lock:
            self._blacklist.add(url)
            return self._rng.choice(self._candidates())

    def refresh_from_report(self, reported: Iterable[str],
                            keep: Callable[[str], bool] = lambda u: True,
    ) -> None:
        """Take a live-node report (the @fullnodeupdate pattern,
        meeseeker.rb:173-189): filtered, deduped, preferred at choice
        time over the seed failover list (which remains the fallback —
        the report never shrinks the recoverable pool); blacklist still
        applies at choice time.  A newer report replaces the previous
        one; an empty (or fully filtered) report clears it, falling back
        to the seed list — the reference's own `nodes.any?` branch."""
        urls = [u for u in dict.fromkeys(reported) if keep(u)]
        with self._lock:
            self._report_urls = urls
