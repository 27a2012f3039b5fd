#!/usr/bin/env python3
"""Golden-expectation generator for the NLP cleaner fixtures.

Executes the REFERENCE cleaner (/root/reference/cleaner_v6.py, read-only)
on the fixture strings and emits src/main/scala/graft/nlp/Goldens.scala.
RapidFuzz is not installed in this container, so we inject a faithful
shim implementing token_sort_ratio (indel/LCS-based similarity, the
published rapidfuzz semantics) and process.extractOne (best score >=
cutoff, first-wins on ties). Builder-side tooling only — the engine
itself is Scala/Spark and never imports this.
"""
import sys
import types

# ---- rapidfuzz shim (public semantics: fuzz.ratio = normalized indel) ----

def _indel_distance(a: str, b: str) -> int:
    la, lb = len(a), len(b)
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        ca = a[i - 1]
        for j in range(1, lb + 1):
            if ca == b[j - 1]:
                cur[j] = prev[j - 1]
            else:
                cur[j] = 1 + min(prev[j], cur[j - 1])
        prev = cur
    return prev[lb]


def _ratio(a: str, b: str) -> float:
    t = len(a) + len(b)
    if t == 0:
        return 100.0
    return 100.0 * (1.0 - _indel_distance(a, b) / t)


def _token_sort_ratio(s1: str, s2: str, **kw) -> float:
    a = " ".join(sorted(s1.split()))
    b = " ".join(sorted(s2.split()))
    return _ratio(a, b)


def _extract_one(query, choices, scorer=None, score_cutoff=0, **kw):
    best = None
    # real rapidfuzz returns (choice, score, INDEX); the cleaner
    # currently discards the third element, but the shim must not
    # silently hand None to any future reader of it
    for i, ch in enumerate(choices):
        s = scorer(query, ch)
        if s >= score_cutoff and (best is None or s > best[1]):
            best = (ch, s, i)
    return best


fuzz_mod = types.ModuleType("rapidfuzz.fuzz")
fuzz_mod.token_sort_ratio = _token_sort_ratio
fuzz_mod.ratio = _ratio
proc_mod = types.ModuleType("rapidfuzz.process")
proc_mod.extractOne = _extract_one
rf_mod = types.ModuleType("rapidfuzz")
rf_mod.fuzz = fuzz_mod
rf_mod.process = proc_mod
sys.modules["rapidfuzz"] = rf_mod
sys.modules["rapidfuzz.fuzz"] = fuzz_mod
sys.modules["rapidfuzz.process"] = proc_mod

sys.path.insert(0, "/root/reference")
from cleaner_v6 import AdvancedLocationCleanerV6  # noqa: E402

# ---- fixture strings (vid order is the contract with ops/Trips.scala) ----

RAW = [
    "تشغيل 12 ساعه مطارررر القاهره وعوده",   # op-prefix + squeeze + rt + fuzzy
    "مطاررر",                                  # squeeze -> fuzzy tier
    "الهرم + وسط البلد",                       # '+' tokenizer, 2 locations
    "ذهاب وعودة المطار",                       # round-trip scrub, airport wins
    "تحصيل فاتورة",                            # admin regex
    "كروز نيلي",                               # cruise keyword
    "مركب",                                    # cruise keyword
    "تشغيل يومية",                             # op-terms only
    "123",                                      # all digits -> Unknown
    "x",                                        # len<2 -> Unknown
    "",                                         # empty -> Undefined
    "some random street",                       # fallback Title Case
    "مطار القاهرة",                            # tier-1 exact
    "فندق هيلتون",                             # tier-1 exact
    "ميدان التحرير",                           # tier-1 exact
    "اهرامات + ابو الهول",                     # 2 variants, same canonical
    "التحرير و الهرم وعودة",                   # 'و' tokenizer + round trip
    "الهرم ، المطار ، هيلتون",                # 3 locations -> pairs
    "مطاار",                                   # typo -> fuzzy (also airport re)
    "downtown airport",                         # EN variants
    None,                                       # NULL end_location
]

cleaner = AdvancedLocationCleanerV6()
assert cleaner._fuzzy_enabled, "fuzzy shim not active"
nofuzz = AdvancedLocationCleanerV6(fuzzy_enabled=False)
# the ctor already honors the kwarg — assert rather than overwrite, so
# a future ctor regression surfaces instead of being masked
assert not nofuzz._fuzzy_enabled, "fuzzy_enabled=False not honored"


def scala_str(s: str) -> str:
    # escape control chars too: a fixture containing a newline would
    # otherwise emit an unclosed Scala string literal in Goldens.scala
    out = []
    for ch in s:
        if ch == "\\":
            out.append("\\\\")
        elif ch == '"':
            out.append('\\"')
        elif ord(ch) < 0x20:
            out.append(f"\\u{ord(ch):04x}")
        else:
            out.append(ch)
    return '"' + "".join(out) + '"'


norms, mains, alls, types_, tokens, tier12, cleans = [], [], [], [], [], [], []
for r in RAW:
    s = "" if r is None else r        # Q4 string-fills nulls before NLP
    norms.append(cleaner._normalize(s))
    mains.append(cleaner.extract_main_location(s))
    detected = cleaner.extract_all_locations(s)
    alls.append(detected)
    types_.append(cleaner.categorize_trip_type(s, detected))
    # pre-lookup token list (raw strip -> round-trip scrub -> tokenize),
    # exactly the sequence inside extract_all_locations
    raw_s = s.strip()
    tokens.append(cleaner._tokenize(cleaner._rt_re.sub(" ", raw_s)))
    tier12.append(nofuzz.extract_all_locations(s))
    cleans.append(cleaner.clean_text(s))

lines = []
lines.append("package graft.nlp")
lines.append("")
lines.append("/** Golden expectations generated by scripts/goldens.py by executing")
lines.append("  * the reference cleaner (reference cleaner_v6.py:156-320) on the")
lines.append("  * fixture strings. vid = index. DO NOT EDIT BY HAND.")
lines.append("  */")
lines.append("object Goldens {")
lines.append("  /** raw end_location per vid (None = NULL row). */")
lines.append("  val raw: Seq[Option[String]] = Seq(")
for r in RAW:
    lines.append("    " + ("None" if r is None else f"Some({scala_str(r)})") + ",")
lines.append("  )")
lines.append("  val normalized: Seq[String] = Seq(")
for v in norms:
    lines.append(f"    {scala_str(v)},")
lines.append("  )")
lines.append("  val mainLocation: Seq[String] = Seq(")
for v in mains:
    lines.append(f"    {scala_str(v)},")
lines.append("  )")
lines.append("  val allLocations: Seq[Seq[String]] = Seq(")
for v in alls:
    inner = ", ".join(scala_str(x) for x in v)
    lines.append(f"    Seq({inner}),")
lines.append("  )")
lines.append("  val tripType: Seq[String] = Seq(")
for v in types_:
    lines.append(f"    {scala_str(v)},")
lines.append("  )")
lines.append("  /** rt-scrub + tokenize output (pre-lookup token list). */")
lines.append("  val tokens: Seq[Seq[String]] = Seq(")
for v in tokens:
    inner = ", ".join(scala_str(x) for x in v)
    lines.append(f"    Seq({inner}),")
lines.append("  )")
lines.append("  /** extract_all_locations with the fuzzy tier disabled")
lines.append("    * (tiers 1-2 only — the pure-relational resolution). */")
lines.append("  val tier12Locations: Seq[Seq[String]] = Seq(")
for v in tier12:
    inner = ", ".join(scala_str(x) for x in v)
    lines.append(f"    Seq({inner}),")
lines.append("  )")
lines.append("  val cleanText: Seq[String] = Seq(")
for v in cleans:
    lines.append(f"    {scala_str(v)},")
lines.append("  )")
lines.append("}")

out = "/root/repo/src/main/scala/graft/nlp/Goldens.scala"
with open(out, "w", encoding="utf-8") as f:
    f.write("\n".join(lines) + "\n")
print(f"wrote {out}")
for i, r in enumerate(RAW):
    print(i, repr(r), "|", repr(norms[i]), "|", mains[i], "|", alls[i], "|",
          types_[i])
