"""Hand-tuned query rewrites ("taylored results").

The reference ships a hardcoded lowercase rewrite map consulted before
tokenization (ref: /root/reference/app/actions/search/special.go:5-41,
29 entries). We implement the *mechanism* — case-insensitive exact-match
rewrite applied after truncation, before tokenization — with a small
default map; deployments supply their own via ``set_special_map``.
"""

from __future__ import annotations

_DEFAULT: dict[str, str] = {
    # representative entries demonstrating the mechanism
    "bitcoin": "bitcoin cryptocurrency",
    "grin": "grin cryptocurrency",
}

_special_map = dict(_DEFAULT)


def set_special_map(m: dict[str, str]) -> None:
    global _special_map
    _special_map = {k.lower(): v for k, v in m.items()}


def rewrite(s: str) -> str:
    """Lowercase exact-match lookup (special.go:36: strings.ToLower)."""
    return _special_map.get(s.lower(), s)
