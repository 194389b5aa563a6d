"""robots.txt parsing + URL admission (RFC 9309 subset).

A crawl-scale corpus keeps per-host robots policies and must re-evaluate
them when filtering or re-publishing urls (takedowns, opt-outs). This is
the standard's core, from scratch:

* group selection: the most specific matching ``User-agent`` line wins
  (longest token match; ``*`` matches any agent and loses to any named
  match); all rules of all groups with that agent token apply.
* rule matching: ``Allow``/``Disallow`` prefix match on the url path with
  ``*`` (any run) and ``$`` (end anchor) wildcards.
* precedence: the LONGEST matching rule wins; at equal length, Allow
  beats Disallow. No matching rule, or an empty Disallow value → allowed.

Dataflow shape: policies are a small per-host table → parsed once into
matchers, broadcast via ``ray.put``; url admission is a ``map_batches``
lookup + regex match per row — no shuffle. At 10^8 hosts the policy table
itself shards by host hash and admission becomes a hash-partitioned
semi-join on host (same key both sides, one exchange).
"""

from __future__ import annotations

import re

import pyarrow as pa


def _rule_regex(value: str) -> re.Pattern | None:
    """Robots rule value → anchored-at-start regex (RFC 9309 §2.2.3)."""
    if not value:
        return None
    anchored = value.endswith("$")
    if anchored:
        value = value[:-1]
    pattern = ".*".join(re.escape(part) for part in value.split("*"))
    return re.compile("^" + pattern + ("$" if anchored else ""))


class RobotsPolicy:
    """Parsed rules for ONE selected user-agent group."""

    __slots__ = ("rules", "crawl_delay")

    def __init__(self, rules: list[tuple[int, bool, re.Pattern | None]],
                 crawl_delay: int | None = None):
        self.crawl_delay = crawl_delay
        self.rules = rules  # (value_len, is_allow, regex)

    def allowed(self, path: str) -> bool:
        best_len, best_allow = -1, True
        for vlen, is_allow, rx in self.rules:
            if rx is None:
                continue
            if rx.match(path):
                # longest match wins; tie → Allow wins (scan order-free:
                # strictly-greater keeps the first seen at equal length,
                # so order Allow rules first within a length class)
                if vlen > best_len or (vlen == best_len and is_allow):
                    best_len, best_allow = vlen, is_allow
        return best_allow


def parse_robots(text: str, agent: str = "graftbot") -> RobotsPolicy:
    """Parse a robots.txt body and select the group for ``agent``."""
    agent = agent.lower()
    groups: list[tuple[list[str], list[tuple[bool, str]], int | None]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[bool, str]] = []
    cur_delay: int | None = None
    in_agent_run = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if not in_agent_run:
                if cur_agents:
                    groups.append((cur_agents, cur_rules, cur_delay))
                cur_agents, cur_rules, cur_delay = [], [], None
                in_agent_run = True
            cur_agents.append(value.lower())
        elif field in ("allow", "disallow"):
            in_agent_run = False
            cur_rules.append((field == "allow", value))
        elif field == "crawl-delay":
            in_agent_run = False
            try:  # integer seconds; fractional/garbage values are ignored
                cur_delay = int(value)
            except ValueError:
                pass
        else:
            in_agent_run = False  # sitemap etc. end the agent run
    if cur_agents:
        groups.append((cur_agents, cur_rules, cur_delay))

    # Most specific agent token: longest agent string that is a prefix of
    # (or equals) our agent name; '*' has specificity 0.
    best_spec, selected = -1, []
    delays: list[int] = []
    for agents, rules, delay in groups:
        spec = -1
        for a in agents:
            if a == "*":
                spec = max(spec, 0)
            elif agent.startswith(a):
                spec = max(spec, len(a))
        if spec > best_spec and spec >= 0:
            best_spec, selected = spec, list(rules)
            delays = [delay] if delay is not None else []
        elif spec == best_spec and spec >= 0:
            selected += rules  # all groups with the winning token apply
            if delay is not None:
                delays.append(delay)
    # Allow-first within the list so equal-length ties resolve to Allow
    # regardless of file order (RFC 9309 §2.2.2).
    selected.sort(key=lambda r: not r[0])
    return RobotsPolicy(
        [(len(v), is_allow, _rule_regex(v)) for is_allow, v in selected],
        crawl_delay=min(delays) if delays else None,
    )


def robots_filter(urls_ds, policies: dict[str, str], agent: str = "graftbot",
                  url_col: str = "url", host_col: str = "host"):
    """Stage: add an ``allowed`` bool column from per-host robots bodies.

    ``policies`` (host → robots.txt body) is parsed ONCE on the driver and
    broadcast; each batch evaluates its paths against the compiled
    matchers. Hosts without a policy are allowed (no robots.txt = crawl)."""
    import ray

    parsed = {h: parse_robots(t, agent) for h, t in policies.items()}
    ref = ray.put(parsed)

    def batch_fn(batch: pa.Table) -> pa.Table:
        pol = ray.get(ref)
        hosts = batch[host_col].to_pylist()
        urls = batch[url_col].to_pylist()
        out = []
        for h, u in zip(hosts, urls):
            p = pol.get(h)
            if p is None:
                out.append(True)
                continue
            rest = u.split("://", 1)[-1]
            path = "/" + rest.split("/", 1)[1] if "/" in rest else "/"
            out.append(p.allowed(path))
        return batch.append_column("allowed", pa.array(out, pa.bool_()))

    return urls_ds.map_batches(batch_fn, batch_format="pyarrow")
