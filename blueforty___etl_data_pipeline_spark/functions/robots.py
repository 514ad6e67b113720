"""robots.txt parsing and crawl-permission decisions (REP — the
Robots Exclusion Protocol, RFC 9309) — the governance gate a
web-crawl training corpus must apply BEFORE content enters the
pipeline: was this URL allowed for our agent when fetched?

The protocol is tiny but full of sharp edges the naive line-splitter
gets wrong, all covered here per RFC 9309:

- groups: consecutive ``User-agent`` lines share the rule block that
  follows; a UA line after rules starts a NEW group (§2.2.1);
- agent selection: the group whose product token LONGEST-matches the
  client's agent wins; otherwise the ``*`` group; otherwise
  everything is allowed (§2.2.1);
- rule matching: the rule whose path prefix is the LONGEST match
  wins; on a length tie ``Allow`` beats ``Disallow`` (§2.2.2);
- an empty ``Disallow:`` means allow-all; unknown directives and
  ``#`` comments are ignored; keys are case-insensitive, paths are
  case-sensitive.

``$`` end-anchors and ``*`` wildcards inside paths (a Google
extension, not RFC 9309) raise ``NotImplementedError`` — an honest
gate, never a silently-wrong prefix match.

Reference parity: the reference pipeline (BlueForty.py) has no crawl
surface; this belongs to the engine's corpus-governance battery
(decontamination, split-leakage, GDPR delete, k-anonymity, …).
"""

from __future__ import annotations


def parse_robots(text: str) -> list[tuple[str, int, str]]:
    """robots.txt → [(agent_lower, is_allow, path_prefix), ...] — one
    row per (group-member-agent × rule), groups expanded so the
    result is a flat relation ready for a Spark explode-join.  The
    sentinel rule ``(agent, 1, '')`` is appended for every agent that
    has a group, so "group exists but nothing matches" decides ALLOW
    with prefix length 0 (RFC 9309 default)."""
    rules: list[tuple[str, int, str]] = []
    current_agents: list[str] = []
    collecting_agents = True
    agents_with_groups: set[str] = set()

    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, value = line.partition(":")
        key = key.strip().lower()
        value = value.strip()
        if key == "user-agent":
            if not collecting_agents:
                current_agents = []
                collecting_agents = True
            current_agents.append(value.lower())
            agents_with_groups.add(value.lower())
        elif key in ("allow", "disallow"):
            collecting_agents = False
            if not current_agents:
                continue  # rules before any User-agent line: ignored
            if value == "":
                if key == "disallow":
                    continue  # empty Disallow = allow all (no rule)
                continue  # empty Allow is meaningless
            if "*" in value or value.endswith("$"):
                raise NotImplementedError(
                    "robots.txt wildcard/anchor path extensions "
                    "('*', '$') are not supported; only RFC 9309 "
                    "prefix rules"
                )
            for a in current_agents:
                rules.append((a, 1 if key == "allow" else 0, value))
        else:
            collecting_agents = False  # sitemap/crawl-delay/etc.
    for a in agents_with_groups:
        rules.append((a, 1, ""))
    return rules


def select_agent(rules: list[tuple[str, int, str]], agent: str) -> str:
    """The product token whose group governs ``agent``: the longest
    rule-agent that is a prefix of the client agent (both lowered),
    else ``*`` if present, else ``''`` (no group — everything
    allowed)."""
    agent = agent.lower()
    best = ""
    for a, _al, _p in rules:
        if a != "*" and agent.startswith(a) and len(a) > len(best):
            best = a
    if best:
        return best
    return "*" if any(a == "*" for a, _al, _p in rules) else ""


def robots_allowed(
    rules: list[tuple[str, int, str]], agent: str, path: str
) -> bool:
    """Full decision: select the governing group, then longest-prefix
    rule; Allow wins length ties; no group or no match ⇒ allowed."""
    gov = select_agent(rules, agent)
    if not gov:
        return True
    best_len = -1
    best_allow = True
    for a, allow, prefix in rules:
        if a != gov:
            continue
        if path.startswith(prefix):
            if len(prefix) > best_len or (
                len(prefix) == best_len and allow and not best_allow
            ):
                best_len = len(prefix)
                best_allow = bool(allow)
    return best_allow
