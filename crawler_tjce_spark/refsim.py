"""Single-threaded reference crawl simulator — the ordering/seen-set oracle.

Recreates the *loop semantics* of the reference crawler so the Spark
engine has an exact target (SURVEY.md §7.1 step 3, BASELINE north_rule
"matching the reference's crawl ordering and URL-seen set"):

* sequential keyset-paginated frontier expansion
  (``crawler/crawler.py:556-677``) → here: wave loop over a frontier;
* exact in-memory seen set (``schemas/entity_mapping_crawler.py:219-223``)
  → membership decided at enqueue time;
* global ``ordem`` counter threaded across pages
  (``crawler/crawler.py:1056-1057``) → contiguous visit numbers;
* politeness budget (rate limits, ``config.py:43-55``) → per-host
  per-wave fetch cap from the robots table;
* robots exclusion → blocked URLs are *seen* but never fetched;
* ``max_pages`` stop guard (``schemas/entity_mapping_crawler.py:271-275``)
  → ``max_waves``.

THE CRAWL CONTRACT (normative for both this simulator and the Spark
engine in ``streaming/runner.py``):

1. seeds enter ``seen`` and (robots permitting) the frontier at depth 0,
   discovered_wave 0;
2. score(url) = 100·salient − 3·depth + 1·discovered_wave, where
   salient = URL contains a CNJ process number;
3. each wave fetches, per host, the top ``host_budget`` frontier URLs
   by (score desc, url asc);
4. within a wave, visit order (→ ``ordem``) is (host asc, score desc,
   url asc);
5. fetched pages' out-links not in ``seen`` enter ``seen`` and, unless
   robots-blocked, the frontier at depth+1, discovered_wave = wave+1;
6. stop when the frontier is empty or ``max_waves`` is reached.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import pyarrow.parquet as pq

SALIENT_RE = re.compile(r"\d{7}-\d{2}\.\d{4}\.\d{1}\.\d{2}\.\d{4}")
SCORE_SALIENT = 100
SCORE_DEPTH = -3
SCORE_RECENCY = 1


def url_is_salient(url: str) -> bool:
    return SALIENT_RE.search(url) is not None


def score_of(salient: bool, depth: int, discovered_wave: int) -> int:
    return SCORE_SALIENT * int(salient) + SCORE_DEPTH * depth + SCORE_RECENCY * discovered_wave


def host_of(url: str) -> str:
    return url.split("://", 1)[1].split("/", 1)[0]


@dataclass
class CrawlResult:
    visits: list[tuple[int, str, int, str]] = field(default_factory=list)  # (ordem, url, wave, host)
    seen: set[str] = field(default_factory=set)
    waves: int = 0
    # url -> (attempts, status, backoff_total_s); populated when the flaky
    # fetch model is on (plans/fetch.py is the distributed twin)
    fetch_lineage: dict[str, tuple[int, str, int]] = field(default_factory=dict)


def simulate(
    world_dir: str,
    max_waves: int = 50,
    flaky_fetch: bool = False,
    flaky_share: int = 10,
    flaky_fail_pct: int = 40,
) -> CrawlResult:
    """Run the reference-semantics crawl over a datagen world dir.

    With ``flaky_fetch``, each visit replays the deterministic retry model
    (tenacity analog — see ``plans/fetch.py``); a visit whose retries
    exhaust is still ordered/seen but expands no links.
    """
    from crawler_tjce_spark.plans.fetch import md5_probe, simulate_fetch

    def host_pct(host: str) -> int:
        if not flaky_fetch:
            return 0
        return flaky_fail_pct if md5_probe(host) < flaky_share else 0
    pages_t = pq.read_table(f"{world_dir}/pages.parquet")
    robots_t = pq.read_table(f"{world_dir}/robots.parquet")
    seeds_t = pq.read_table(f"{world_dir}/seeds.parquet")

    pages: dict[str, list[str]] = {
        url: links
        for url, links in zip(pages_t["url"].to_pylist(), pages_t["out_links"].to_pylist())
    }
    robots: dict[str, dict] = {
        h: {"disallow": d, "budget": b}
        for h, d, b in zip(
            robots_t["host"].to_pylist(),
            robots_t["disallow_prefix"].to_pylist(),
            robots_t["host_budget"].to_pylist(),
        )
    }

    def blocked(url: str) -> bool:
        r = robots.get(host_of(url))
        if r is None:
            return False
        rest = url.split("://", 1)[1]
        path = "/" + rest.split("/", 1)[1] if "/" in rest else "/"
        return path.startswith(r["disallow"])

    res = CrawlResult()
    frontier: dict[str, tuple[int, int, bool]] = {}  # url -> (depth, discovered_wave, salient)
    for url in seeds_t["url"].to_pylist():
        if url in res.seen:
            continue
        res.seen.add(url)
        if not blocked(url):
            frontier[url] = (0, 0, url_is_salient(url))

    ordem = 0
    for wave in range(max_waves):
        if not frontier:
            break
        res.waves = wave + 1
        # politeness pick: per host, top budget by (score desc, url asc)
        by_host: dict[str, list[tuple[int, str, int]]] = {}
        for url, (depth, dw, sal) in frontier.items():
            by_host.setdefault(host_of(url), []).append((score_of(sal, depth, dw), url, depth))
        picked: list[tuple[str, int, str, int]] = []  # (host, score, url, depth)
        for h, entries in by_host.items():
            entries.sort(key=lambda e: (-e[0], e[1]))
            budget = robots.get(h, {}).get("budget", 4)
            for sc, url, depth in entries[:budget]:
                picked.append((h, sc, url, depth))
        # visit order within the wave: (host asc, score desc, url asc)
        picked.sort(key=lambda p: (p[0], -p[1], p[2]))
        for h, sc, url, depth in picked:
            ordem += 1
            res.visits.append((ordem, url, wave, h))
            del frontier[url]
            attempts, status, backoff = simulate_fetch(url, host_pct(h))
            res.fetch_lineage[url] = (attempts, status, backoff)
            if status == "error":
                continue  # retries exhausted: visited but nothing fetched
            for link in pages.get(url, []):
                if link in res.seen:
                    continue
                res.seen.add(link)
                if not blocked(link):
                    frontier[link] = (depth + 1, wave + 1, url_is_salient(link))
    return res
