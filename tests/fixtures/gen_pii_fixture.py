"""One-shot deterministic generator for pii_docs.csv.

The driver's synthetic documents table carries no PII-shaped strings
(lowercase word salad, no digits), so the PII-scrub operator runs over
this committed fixture instead — the same pattern as taxi_events.csv
(geo) and embeddings_planted.parquet (strict embedding dedup). Emits
pipe-delimited (doc_id, text) lines where a seeded PRNG plants a known
mix of emails, phone numbers, and IPv4 addresses inside word-salad
text, plus clean rows, so redaction counts are non-trivial and
reproducible byte-for-byte.

Run from the repo root: python tests/fixtures/gen_pii_fixture.py
"""

from __future__ import annotations

import random
from pathlib import Path

N_ROWS = 200
WORDS = (
    "the quick contact reach support sales billing team office admin "
    "please write call dial visit server host node endpoint login user "
    "report issue ticket order invoice account data table spark query"
).split()
NAMES = ("ana", "bob", "carol.x", "dave99", "eve_p", "frank-м".replace("м", "m"))
DOMAINS = ("example.com", "mail.test.org", "corp.example.co.uk")


def _email(rng: random.Random) -> str:
    return f"{rng.choice(NAMES)}@{rng.choice(DOMAINS)}"


def _phone(rng: random.Random) -> str:
    if rng.random() < 0.5:
        return f"+{rng.randrange(1, 99)} {rng.randrange(100, 999)}-{rng.randrange(1000, 9999)}-{rng.randrange(100, 999)}"
    return f"{rng.randrange(200, 999)} {rng.randrange(100, 999)} {rng.randrange(1000, 9999)}"


def _ip(rng: random.Random) -> str:
    return ".".join(str(rng.randrange(1, 255)) for _ in range(4))


def main() -> None:
    rng = random.Random(2026)
    out = Path(__file__).parent / "pii_docs.csv"
    lines = []
    for i in range(N_ROWS):
        toks = [rng.choice(WORDS) for _ in range(rng.randrange(8, 30))]
        r = rng.random()
        if r < 0.35:  # plant 1-3 emails
            for _ in range(rng.randrange(1, 4)):
                toks.insert(rng.randrange(len(toks)), _email(rng))
        if 0.25 < r < 0.6:  # plant phones (overlapping band: mixed rows)
            for _ in range(rng.randrange(1, 3)):
                toks.insert(rng.randrange(len(toks)), _phone(rng))
        if 0.5 < r < 0.8:  # plant IPs
            toks.insert(rng.randrange(len(toks)), _ip(rng))
        text = " ".join(toks)
        assert "|" not in text
        lines.append(f"{i}|{text}")
    out.write_text("\n".join(lines) + "\n")
    print(f"wrote {out} ({len(lines)} rows)")


if __name__ == "__main__":
    main()
