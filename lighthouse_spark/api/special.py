"""Hand-tuned query rewrites ("taylored results").

The reference consults a hardcoded rewrite map before tokenization
(ref: /root/reference/app/actions/search/special.go:5-41, 29 entries);
the full map ships here as DATA (it defines what to compute). Faithful
quirk preserved: the lookup lowercases the QUERY but not the map keys
(special.go:36 `strings.ToLower(s)` against the raw map), so the seven
entries whose keys contain uppercase ("Alex jones", "Radio Québec",
"The Alex Jones Channel", "Alex Jones", "3Dto5DConsciousness",
"PostMillennial", "Louis Rossman") can never match — exactly as
upstream. Deployments may swap the map via ``set_special_map`` (which
keeps keys verbatim for the same reason).
"""

from __future__ import annotations

# special.go:5-34, verbatim
_DEFAULT: dict[str, str] = {
    "silvano": "@SilvanoTrotta",
    "trotta": "@SilvanoTrotta",
    "silvano trotta": "@SilvanoTrotta",
    "corbett": "@CorbettReport",
    "linux gamer": "thelinuxgamer",
    "linuxgamer": "thelinuxgamer",
    "tim pool": "timcast",
    "jordan peterson": "jordanbpeterson",
    "quartering": "thequartering",
    "bombards": "Bombards_Body_Language",
    "bombard body language": "Bombards_Body_Language",
    "bombards body language": "Bombards_Body_Language",
    "stefan molyneux": "@freedomain",
    "crypto wendy": "CRYPTOWENDYO",
    "Alex jones": "alexjoneschannel",
    "styx": "Styxhexenhammer666",
    "styxx": "Styxhexenhammer666",
    "Radio Québec": "Radio-Quebec",
    "The Alex Jones Channel": "Alex Jones Channel",
    "Alex Jones": "Alex Jones Channel",
    "3Dto5DConsciousness": "3D-to-5D-Consciousness",
    "PostMillennial": "ThePostMillennial",
    "planètes": "planetes360",
    "planetes": "planetes360",
    "planètes 360": "planetes360",
    "planetes 360": "planetes360",
    "Louis Rossman": "Louis Rossmann",
}

_special_map = dict(_DEFAULT)


def set_special_map(m: dict[str, str]) -> None:
    """Replace the rewrite map (keys kept verbatim — see module doc)."""
    global _special_map
    _special_map = dict(m)


def rewrite(s: str) -> str:
    """Lowercase exact-match lookup (special.go:35-41)."""
    return _special_map.get(s.lower(), s)
