"""robots.txt parsing + per-host cache.

The reference has **no robots handling** (SURVEY.md verified negative);
the north_rule adds it.  Minimal, deterministic parser: ``User-agent``
groups, ``Allow``/``Disallow`` prefix rules, longest-prefix-wins
(Google's public robots.txt semantics), '*' agent only.  The cache is
held per frontier shard (hosts hash to one shard, so each host's rules
live exactly once); entries are plain dicts → checkpointable.
"""

from __future__ import annotations

from urllib.parse import urlparse


def parse_robots(text: str) -> list[tuple[str, bool]]:
    """→ list of (path_prefix, allowed) rules for User-agent: *."""
    rules: list[tuple[str, bool]] = []
    applies = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            applies = value == "*"
        elif applies and field in ("allow", "disallow"):
            if value:
                rules.append((value, field == "allow"))
            elif field == "disallow":
                pass  # "Disallow:" empty = allow all → no rule
    return rules


def is_allowed(rules: list[tuple[str, bool]], path: str) -> bool:
    """Longest-matching-prefix rule decides; default allow."""
    best_len, allowed = -1, True
    for prefix, allow in rules:
        if path.startswith(prefix) and len(prefix) > best_len:
            best_len, allowed = len(prefix), allow
    return allowed


class RobotsCache:
    """Per-host parsed-rule cache.  ``fetch_fn(robots_url) -> str|None``
    is called once per host (the synthetic web in tests, HTTP in prod)."""

    def __init__(self, fetch_fn=None, enabled: bool = True):
        self.fetch_fn = fetch_fn
        self.enabled = enabled
        self.rules: dict[str, list[tuple[str, bool]]] = {}

    def _rules_for(self, host: str) -> list[tuple[str, bool]]:
        if host not in self.rules:
            text = None
            if self.fetch_fn is not None:
                try:
                    text = self.fetch_fn(f"http://{host}/robots.txt")
                except Exception:
                    text = None
            self.rules[host] = parse_robots(text) if text else []
        return self.rules[host]

    def allowed(self, url: str) -> bool:
        if not self.enabled:
            return True
        parsed = urlparse(url)
        return is_allowed(self._rules_for(parsed.netloc), parsed.path or "/")

    # -- checkpointing -------------------------------------------------
    def state(self) -> dict:
        return {"enabled": self.enabled, "rules": self.rules}

    def restore(self, state: dict) -> None:
        self.enabled = state["enabled"]
        self.rules = state["rules"]
