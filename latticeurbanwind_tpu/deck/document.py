"""Deck document: order-insensitive parse + canonicalizing render of `.luw*` decks.

Behavioral contract (parity with /root/reference/core/deck_io.py):
  * `key = value` lines; `//` starts a comment (respecting quotes); a comment
    line whose text matches a section title/alias switches the current section.
  * keys are normalized (dashes/spaces -> underscores, aliases -> canonical).
  * unknown keys are preserved and rendered in the `custom` (or current) section.
  * duplicate keys keep the last value and are tracked.
  * getters are tolerant: quotes stripped, fuzzy bools, NaN floats rejected.
  * `render()` rebuilds the deck in canonical section order, rewrites fuzzy
    bools to true/false and re-brackets list values.
The deck is a mutable case database: pipeline stages write derived values back.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from pathlib import Path
from typing import Dict, Iterable, List, Optional, Tuple

from .schema import (
    FIELD_MAP,
    FIELD_ORDER,
    FIELD_SECTION,
    LIST_KINDS,
    SECTION_ALIASES,
    SECTION_ORDER,
    SECTION_TITLES,
    normalize_key,
    parse_bool_token,
    strip_quotes,
)


class DeckParseError(ValueError):
    """Raised for fatal deck syntax problems (e.g. strict duplicate keys)."""


def _find_comment_start(line: str) -> int:
    """Index of `//` outside quotes, or -1."""
    in_s = in_d = False
    for i in range(len(line) - 1):
        c = line[i]
        if c == "'" and not in_d:
            in_s = not in_s
        elif c == '"' and not in_s:
            in_d = not in_d
        elif c == "/" and line[i + 1] == "/" and not in_s and not in_d:
            return i
    return -1


def _section_label(text: str) -> str:
    s = text.strip().lower()
    if s.startswith("[") and "]" in s:
        s = s[1 : s.index("]")]
    return " ".join(s.split())


_SECTION_LOOKUP: Dict[str, str] = {}
for _sid in SECTION_ORDER:
    _SECTION_LOOKUP[_section_label(_sid)] = _sid
    _SECTION_LOOKUP[_section_label(SECTION_TITLES[_sid])] = _sid
    for _alias in SECTION_ALIASES[_sid]:
        _SECTION_LOOKUP[_section_label(_alias)] = _sid


def _match_section_header(stripped: str) -> Optional[str]:
    if stripped.startswith("//"):
        label = stripped[2:]
    elif stripped.startswith("#"):
        label = stripped[1:]
    else:
        return None
    return _SECTION_LOOKUP.get(_section_label(label))


def _split_list(raw: str) -> List[str]:
    text = raw.strip()
    if text.startswith("[") and text.endswith("]"):
        text = text[1:-1]
    return [p.strip() for p in text.split(",") if p.strip()]


def _scalar_text(value: object) -> str:
    if isinstance(value, bool):
        return "true" if value else "false"
    if isinstance(value, float):
        return f"{value:.6f}"
    if isinstance(value, int):
        return str(value)
    return str(value).strip()


@dataclass
class DeckEntry:
    key: str
    value: str
    section: str
    comment: str = ""
    known: bool = True


@dataclass
class DeckDocument:
    path: Optional[Path] = None
    preamble: List[str] = dc_field(default_factory=list)
    entries: Dict[str, DeckEntry] = dc_field(default_factory=dict)
    loose_lines: Dict[str, List[str]] = dc_field(default_factory=dict)
    unknown_order: Dict[str, List[str]] = dc_field(default_factory=dict)
    duplicates: Dict[str, List[str]] = dc_field(default_factory=dict)

    # -- construction ------------------------------------------------------

    @classmethod
    def from_text(cls, text: str, *, path: Optional[Path] = None,
                  strict_duplicates: bool = False) -> "DeckDocument":
        doc = cls(path=path)
        section: Optional[str] = None
        seen_content = False

        for raw_line in text.replace("\r\n", "\n").replace("\r", "\n").split("\n"):
            line = raw_line.rstrip()
            stripped = line.strip()

            header = _match_section_header(stripped)
            if header is not None:
                section = header
                seen_content = True
                continue

            ci = _find_comment_start(line)
            content = line if ci < 0 else line[:ci]
            comment = "" if ci < 0 else line[ci:].strip()

            kv = content.strip()
            if kv and "=" in kv:
                raw_key, raw_value = kv.split("=", 1)
                key = normalize_key(raw_key)
                if key:
                    known = key in FIELD_SECTION
                    sec = FIELD_SECTION.get(key, section or "custom")
                    if key in doc.entries:
                        doc.duplicates.setdefault(key, [doc.entries[key].value]).append(raw_value.strip())
                    doc.entries[key] = DeckEntry(key, raw_value.strip(), sec, comment, known)
                    if not known:
                        order = doc.unknown_order.setdefault(sec, [])
                        if key not in order:
                            order.append(key)
                    seen_content = True
                    continue

            if not stripped:
                if not seen_content and section is None:
                    doc.preamble.append("")
                continue
            if not seen_content and section is None:
                doc.preamble.append(line)
            else:
                doc.loose_lines.setdefault(section or "custom", []).append(line)

        if strict_duplicates and doc.duplicates:
            raise DeckParseError(
                "Duplicate deck keys are not allowed: " + ", ".join(sorted(doc.duplicates)))
        return doc

    @classmethod
    def load(cls, path: Path | str, *, strict_duplicates: bool = False) -> "DeckDocument":
        p = Path(path).expanduser().resolve()
        return cls.from_text(p.read_text(encoding="utf-8", errors="ignore"),
                             path=p, strict_duplicates=strict_duplicates)

    # -- getters -----------------------------------------------------------

    def has(self, key: str) -> bool:
        return normalize_key(key) in self.entries

    def get_raw(self, key: str, default: Optional[str] = None) -> Optional[str]:
        entry = self.entries.get(normalize_key(key))
        return entry.value if entry is not None else default

    def get_text(self, key: str, default: Optional[str] = None) -> Optional[str]:
        raw = self.get_raw(key)
        if raw is None:
            return default
        return strip_quotes(raw)

    def get_int(self, key: str, default: Optional[int] = None) -> Optional[int]:
        text = self.get_text(key)
        if text in (None, ""):
            return default
        try:
            return int(text)
        except (TypeError, ValueError):
            return default

    def get_float(self, key: str, default: Optional[float] = None) -> Optional[float]:
        text = self.get_text(key)
        if text in (None, ""):
            return default
        try:
            value = float(text)
        except (TypeError, ValueError):
            return default
        return default if value != value else value  # reject NaN

    def get_bool(self, key: str, default: Optional[bool] = None) -> Optional[bool]:
        text = self.get_text(key)
        if text is None:
            return default
        parsed = parse_bool_token(text)
        return default if parsed is None else parsed

    def get_list(self, key: str) -> List[str]:
        raw = self.get_raw(key)
        return [] if raw is None else _split_list(raw)

    def get_float_list(self, key: str) -> List[float]:
        out: List[float] = []
        for item in self.get_list(key):
            try:
                out.append(float(item))
            except (TypeError, ValueError):
                return []
        return out

    def get_pair(self, key: str) -> Optional[Tuple[float, float]]:
        values = self.get_float_list(key)
        if len(values) != 2:
            return None
        lo, hi = sorted(values)
        return lo, hi

    def get_int_list(self, key: str) -> List[int]:
        out: List[int] = []
        for item in self.get_list(key):
            try:
                out.append(int(float(item)))
            except (TypeError, ValueError):
                return []
        return out

    # -- setters -----------------------------------------------------------

    def set_raw(self, key: str, value: str, *, section: Optional[str] = None,
                comment: Optional[str] = None) -> None:
        k = normalize_key(key)
        existing = self.entries.get(k)
        sec = section or FIELD_SECTION.get(k) or (existing.section if existing else "custom")
        if comment is None and existing is not None:
            comment = existing.comment
        entry = DeckEntry(k, value.strip(), sec, (comment or "").strip(), k in FIELD_SECTION)
        self.entries[k] = entry
        self.duplicates.pop(k, None)
        if not entry.known:
            order = self.unknown_order.setdefault(sec, [])
            if k not in order:
                order.append(k)

    def set_text(self, key: str, value: str, *, quoted: bool = False,
                 section: Optional[str] = None, comment: Optional[str] = None) -> None:
        text = value.strip()
        self.set_raw(key, f'"{text}"' if quoted else text, section=section, comment=comment)

    def set_int(self, key: str, value: int, **kw) -> None:
        self.set_raw(key, str(int(value)), **kw)

    def set_float(self, key: str, value: float, *, precision: int = 6, **kw) -> None:
        self.set_raw(key, f"{float(value):.{precision}f}", **kw)

    def set_bool(self, key: str, value: bool, **kw) -> None:
        self.set_raw(key, "true" if value else "false", **kw)

    def set_list(self, key: str, values: Iterable[object], **kw) -> None:
        self.set_raw(key, "[" + ", ".join(_scalar_text(v) for v in values) + "]", **kw)

    def set_pair(self, key: str, pair: Iterable[float], *, precision: int = 6, **kw) -> None:
        values = list(pair)
        if len(values) != 2:
            raise ValueError(f"{key} expects exactly 2 values, got {len(values)}")
        self.set_raw(key, "[" + ", ".join(f"{float(v):.{precision}f}" for v in values) + "]", **kw)

    def remove(self, key: str) -> None:
        k = normalize_key(key)
        self.entries.pop(k, None)
        self.duplicates.pop(k, None)

    def duplicate_keys(self) -> List[str]:
        return sorted(self.duplicates)

    def to_dict(self) -> Dict[str, str]:
        return {k: e.value for k, e in self.entries.items()}

    # -- rendering ---------------------------------------------------------

    def render(self) -> str:
        lines: List[str] = []
        if any(ln.strip() for ln in self.preamble):
            lines.extend(self.preamble)
            while lines and lines[-1] == "":
                lines.pop()
            if lines:
                lines.append("")
        else:
            lines.extend(["// LUW deck", ""])

        for sid in SECTION_ORDER:
            block = self._render_section(sid)
            if block:
                lines.extend(block)
                lines.append("")

        while lines and lines[-1] == "":
            lines.pop()
        return "\n".join(lines) + "\n"

    def save(self, path: Optional[Path | str] = None) -> Path:
        target = Path(path).expanduser().resolve() if path is not None else self.path
        if target is None:
            raise ValueError("No target path provided for deck save.")
        target.write_text(self.render(), encoding="utf-8")
        self.path = target
        return target

    def _render_section(self, sid: str) -> List[str]:
        known = [k for k in FIELD_ORDER.get(sid, ())
                 if k in self.entries and self.entries[k].section == sid]
        unknown = [k for k in self.unknown_order.get(sid, ())
                   if k in self.entries and self.entries[k].section == sid]
        loose = [ln for ln in self.loose_lines.get(sid, ()) if ln.strip()]
        if not (known or unknown or loose):
            return []
        lines = [f"// {SECTION_TITLES.get(sid, sid.title())}"]
        lines.extend(loose)
        for k in known + unknown:
            lines.append(self._render_entry(self.entries[k]))
        return lines

    @staticmethod
    def _render_entry(entry: DeckEntry) -> str:
        value = entry.value.strip()
        spec = FIELD_MAP.get(entry.key) if entry.known else None
        if spec is not None and value:
            if spec.kind == "boolean":
                parsed = parse_bool_token(value)
                if parsed is not None:
                    value = "true" if parsed else "false"
            elif spec.kind in LIST_KINDS:
                value = "[" + ", ".join(_split_list(value)) + "]"
            elif spec.quoted:
                value = f'"{strip_quotes(value)}"'
        line = f"{entry.key} =" + (f" {value}" if value else "")
        if entry.comment:
            line += f" {entry.comment}"
        return line.rstrip()


def load_deck(path: Path | str, *, strict_duplicates: bool = False) -> DeckDocument:
    return DeckDocument.load(path, strict_duplicates=strict_duplicates)


def parse_deck_text(text: str, *, strict_duplicates: bool = False) -> DeckDocument:
    return DeckDocument.from_text(text, strict_duplicates=strict_duplicates)


def deck_mode_from_path(path: Path | str) -> str:
    """Run mode from deck extension: .luw standard, .luwdg dataset-gen, .luwpf profile."""
    suffix = Path(path).suffix.lower().lstrip(".")
    if suffix in ("luw", "luwdg", "luwpf"):
        return suffix
    raise ValueError(f"Unrecognized deck extension: {path}")
