#!/usr/bin/env python3
"""Builder-side leak scan (self-evidencing): greps the same classes of
pattern the driver's LEAKCHECK tracks -- non-public imports, URLs outside
public domains, cloud bucket URIs, chat links, API-key shapes, unexpected
env vars -- over every source/docs file the builder authored, and stamps
scan provenance (files scanned, tree hash) into LEAKCHECK_local.json so
the artifact proves WHAT was scanned, not just that zero hits came back.

Usage: python3 tools/leakscan.py [--round N] [--out LEAKCHECK_local.json]
"""
import argparse, hashlib, json, os, re, subprocess, sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Everything the builder authored: Scala sources + sbt build + top-level
# markdown/tools. Driver-written artifacts (BENCH_*, CORRECTNESS_*, the
# retrieved PAPERS/SNIPPETS) are excluded -- they are not builder output.
SCAN_GLOBS = [
    ("src", (".scala",)),
    ("project", (".sbt", ".scala", ".properties")),
    ("tools", (".py", ".sh")),
    (".", (".sbt",)),
]
SCAN_FILES = ["README.md", "PERF.md", "COVERAGE.md", "MIGRATION.md", "FIXTURES.md"]

PUBLIC_IMPORT_ROOTS = (
    "org.apache.", "java.", "javax.", "scala.", "graft.",
    "org.scalatest.", "org.scalacheck.", "org.slf4j.", "com.fasterxml.",
)
PUBLIC_URL_HOSTS = (
    "apache.org", "spark.apache.org", "github.com", "arxiv.org",
    "duckdb.org", "scala-lang.org", "scala-sbt.org", "example.com",
    "localhost", "www.w3.org", "opensource.org",
)
ALLOWED_ENV_PREFIXES = ("SPARK_", "JAVA_", "SBT_", "PATH", "HOME",
                        "COURSIER_", "TMPDIR", "USER", "TZ")

CHECKS = {
    "internal-import": re.compile(r"^\s*import\s+([a-zA-Z_][\w.]*)", re.M),
    "internal-url": re.compile(r"https?://([\w.-]+)"),
    "internal-bucket": re.compile(r"\b(?:s3a?|gs|abfss?|wasbs?)://[\w./-]+"),
    "slack-link": re.compile(r"\b[\w-]*slack\.com\b|\bgo/[a-z][\w-]{2,}\b"),
    "api-key": re.compile(r"\b(?:sk-[A-Za-z0-9]{20,}|AKIA[0-9A-Z]{16}|ghp_[A-Za-z0-9]{30,}|xox[baprs]-[A-Za-z0-9-]{10,})\b"),
    "env-var": re.compile(r"""sys\.env(?:\.getOrElse)?\(\s*"([A-Z][A-Z0-9_]*)"|System\.getenv\(\s*"([A-Z][A-Z0-9_]*)\""""),
}


def files_to_scan():
    out = []
    for sub, exts in SCAN_GLOBS:
        base = os.path.join(ROOT, sub)
        if not os.path.isdir(base):
            continue
        if sub == ".":
            out += [os.path.join(base, f) for f in os.listdir(base)
                    if f.endswith(exts) and os.path.isfile(os.path.join(base, f))]
            continue
        for dirpath, dirnames, filenames in os.walk(base):
            dirnames[:] = [d for d in dirnames if d not in ("target", ".bsp")]
            out += [os.path.join(dirpath, f) for f in filenames if f.endswith(exts)]
    out += [p for f in SCAN_FILES if os.path.isfile(p := os.path.join(ROOT, f))]
    return sorted(set(out))


def scan(paths):
    hits = {k: [] for k in CHECKS}
    hits["internal-pkg2"] = []  # name parity with the driver artifact
    for p in paths:
        rel = os.path.relpath(p, ROOT)
        if rel == os.path.join("tools", "leakscan.py"):
            continue  # the scanner's own pattern definitions are not leaks
        try:
            text = open(p, encoding="utf-8", errors="replace").read()
        except OSError as e:
            hits.setdefault("unreadable", []).append(f"{rel}: {e}")
            continue
        for imp in CHECKS["internal-import"].findall(text):
            # only ROOTED package imports can leak a vendor namespace;
            # value/relative imports (spark.implicits._, QLlm.x) cannot
            rooted = re.match(r"^(com|org|net|io|ai|dev|co|edu|gov|software|cloud)\.", imp)
            if rooted and not imp.startswith(PUBLIC_IMPORT_ROOTS):
                hits["internal-import"].append(f"{rel}: import {imp}")
        for host in CHECKS["internal-url"].findall(text):
            # dotless "hosts" are string-concat fragments of synthetic
            # URLs, not addressable names; *.example is the reserved
            # documentation TLD (RFC 2606) used by the PII/url-extraction
            # test corpora
            if "." not in host or host.endswith(".example"):
                continue
            if not any(host == h or host.endswith("." + h) for h in PUBLIC_URL_HOSTS):
                hits["internal-url"].append(f"{rel}: {host}")
        for name in ("internal-bucket", "slack-link", "api-key"):
            for m in CHECKS[name].findall(text):
                hits[name].append(f"{rel}: {m}")
        for m in CHECKS["env-var"].finditer(text):
            var = m.group(1) or m.group(2)
            if var and not var.startswith(ALLOWED_ENV_PREFIXES):
                hits["env-var"].append(f"{rel}: {var}")
    return {k: v for k, v in hits.items()}


def tree_sha(paths):
    h = hashlib.sha256()
    for p in paths:
        h.update(os.path.relpath(p, ROOT).encode())
        h.update(hashlib.sha256(open(p, "rb").read()).digest())
    return h.hexdigest()


def main():
    ap = argparse.ArgumentParser()
    # default: derive the round from the newest driver CORRECTNESS_r*.json
    # so the stamp can't go stale again (VERDICT r12 "what's wrong" #3)
    import glob
    rounds = [int(m.group(1))
              for p in glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))
              for m in [re.search(r"CORRECTNESS_r(\d+)\.json$", p)] if m]
    max_round = max(rounds) if rounds else None
    ap.add_argument("--round", type=int,
                    default=(max_round + 1 if rounds else 0))
    ap.add_argument("--out", default=os.path.join(ROOT, "LEAKCHECK_local.json"))
    args = ap.parse_args()
    paths = files_to_scan()
    hits = scan(paths)
    try:
        head = subprocess.run(["git", "-C", ROOT, "rev-parse", "HEAD"],
                              capture_output=True, text=True).stdout.strip()
    except OSError:
        head = None
    doc = {
        "round": args.round,
        # disambiguate the derived default around round close (ADVICE
        # r13): `round` means "the tree being built FOR round N" and is
        # max(CORRECTNESS_r*)+1 at derivation time; a re-run AFTER the
        # driver writes round N's CORRECTNESS file would stamp N+1 for
        # the same tree, so the artifact also records what the default
        # was derived from.
        "derived_from_correctness_round": max_round,
        "files_scanned": len(paths),
        "tree_sha256": tree_sha(paths),
        "git_head": head,
        "n_hits": sum(len(v) for v in hits.values()),
        "hits": hits,
    }
    with open(args.out, "w") as f:
        json.dump(doc, f, indent=2)
    print(f"scanned {len(paths)} files, {doc['n_hits']} hits -> {args.out}")
    return 1 if doc["n_hits"] else 0


if __name__ == "__main__":
    sys.exit(main())
