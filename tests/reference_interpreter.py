"""Independent pure-Python interpreter of the reference filter's runtime
semantics (/root/reference/lib/fluent/plugin/filter_geoip.rb:106-202),
written directly against the Ruby control flow — NOT sharing any code with
the package's compile-to-Column implementation. Used as the differential
oracle for property-based tests: for any (config, record), Spark output must
equal this interpreter's output.
"""

from __future__ import annotations

import json
import re

RE_SINGLE = re.compile(
    r"""^\$\{
          (?P<geoip_key>-?[^\[\]]+)
          \[
            (?:(?P<dq>")|(?P<sq>'))
            (?P<record_key>-?(?(dq)[^"{}]+|[^'{}]+))
            (?(dq)"|')
          \]
        \}$""",
    re.X,
)
RE_SCAN = re.compile(r"""['"]?(\$\{[^\}]+?\})['"]?""")


def ruby_to_s(v) -> str:
    if v is None:
        return ""
    if isinstance(v, float):
        # Ruby flo_to_s: same shortest-roundtrip digits and sci-notation
        # thresholds as Python repr, but the exponent form always carries a
        # fractional mantissa ("1.0e+16", "1.0e-05") and specials are spelled
        # Infinity/NaN.
        if v != v:
            return "NaN"
        if v in (float("inf"), float("-inf")):
            return "Infinity" if v > 0 else "-Infinity"
        s = repr(v)
        if "e" in s:
            mant, exp = s.split("e")
            if "." not in mant:
                mant += ".0"
            s = mant + "e" + exp
        return s
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def is_json(text: str) -> bool:
    t = text.strip()
    return bool(re.match(r"^\[.+\]$", t, re.S) or re.match(r"^\{.+\}$", t, re.S))


def quoted_value(text: str) -> bool:
    return bool(re.match(r"(^'.+'$|^\".+\"$)", text, re.S))


class RefGeoipFilter:
    """Mirror of GeoipFilter#filter for one backend DB given as a python
    interval list [(start, end, {attr_path: value})]."""

    def __init__(self, lookup_keys, records, ranges,
                 skip_adding_null_record=False):
        self.lookup_keys = list(lookup_keys)
        self.map = {k: (v[1:-1] if quoted_value(v) else v)
                    for k, v in records.items()}
        self.ranges = sorted(ranges)
        self.skip = skip_adding_null_record
        # placeholder extraction: scan the concatenation, uniq, keep order
        self.placeholder_keys = []
        for m in RE_SCAN.finditer("".join(self.map.values())):
            if m.group(1) not in self.placeholder_keys:
                self.placeholder_keys.append(m.group(1))

    # geolocate (rb:167-185): parse ip, probe intervals
    def _lookup(self, ip):
        if ip is None or ip == "":
            return None
        m = re.match(r"^(\d{1,3})\.(\d{1,3})\.(\d{1,3})\.(\d{1,3})$",
                     str(ip))
        if not m:
            return None
        octs = [int(x) for x in m.groups()]
        if any(o > 255 for o in octs):
            return None
        v = (octs[0] << 24) | (octs[1] << 16) | (octs[2] << 8) | octs[3]
        for s, e, attrs in self.ranges:
            if s <= v <= e:
                return dict(attrs)
        return None

    def _get_address(self, record):
        out = {}
        for key in self.lookup_keys:
            if key.startswith("$"):
                if key.startswith("$."):
                    path = key[2:].split(".")
                else:
                    path = [a or b for a, b in
                            re.findall(r"\[(?:\"([^\"]+)\"|'([^']+)')\]", key[1:])]
                cur = record
                for p in path:
                    cur = cur.get(p) if isinstance(cur, dict) else None
                    if cur is None:
                        break
                out[key] = cur
            else:
                out[key] = record.get(key)
        return out

    # create_placeholder (rb:187-202)
    def _placeholders(self, geodata):
        placeholder = {}
        for key in self.placeholder_keys:
            m = RE_SINGLE.match(key)
            if m is None or geodata.get(m.group("record_key")) is None:
                continue
            attrs = geodata[m.group("record_key")]
            value = attrs.get(m.group("geoip_key"))
            leaf = m.group("geoip_key").split(".")[-1]
            if leaf in ("latitude", "longitude"):
                value = value if value is not None else 0.0
            placeholder[key] = value
        return placeholder

    # add_geoip_field (rb:121-139)
    def filter(self, record):
        record = dict(record)
        geodata = {k: self._lookup(ip)
                   for k, ip in self._get_address(record).items()}
        placeholder = self._placeholders(geodata)
        if self.skip:
            # Ruby: `placeholder.values.first.nil?` — the first INSERTED
            # entry (create_placeholder skips missed lookups entirely), not
            # the first positional placeholder key.
            first = next(iter(placeholder.values()), None)
            if first is None:
                return record
        for out_key, value in self.map.items():
            if RE_SINGLE.match(value):
                rewritten = placeholder.get(value)
            elif is_json(value):
                def encode(m):
                    inner = m.group(0)
                    if quoted_value(inner):
                        inner = inner[1:-1]
                    return json.dumps(placeholder.get(inner))
                try:
                    rewritten = json.loads(RE_SCAN.sub(encode, value))
                except ValueError:
                    rewritten = None
            else:
                rewritten = RE_SCAN.sub(
                    lambda m: ruby_to_s(placeholder.get(m.group(0))), value)
            record[out_key] = rewritten
        return record
