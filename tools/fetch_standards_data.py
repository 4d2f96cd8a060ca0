"""Vendor public standards data the engine consumes from the environment
(r4 VERDICT #5: "vendor-or-verify path"). Runs where network access
exists; this sandbox has none, so the tool is exercised in --verify mode
against any already-present checkout.

Adobe CMap resources (predefined registry CMaps — UniGB-UCS2-H etc.):

    python tools/fetch_standards_data.py --dest /path/to/cmap-data
    export UNIPDF_SPARK_CMAP_DIR=/path/to/cmap-data

downloads Adobe's public cmap-resources distribution (BSD-licensed,
https://github.com/adobe-type-tools/cmap-resources) and lays the CMap
files out exactly as `pdf/cmap_resources.py` consumes them (any tree
whose files are named after the CMap). `--verify` then parses every
vendored CMap with the engine's own parser and checks:

* every file parses as a PostScript CMap (codespace + cid ranges),
* `usecmap` chain targets resolve within the vendored set,
* the registry loads UniGB-UCS2-H / UniJIS-UCS2-H when the ordering
  directories are present.

JBIG2 Annex B.1-B.15 standard Huffman tables need NO fetch since r5:
they are transcribed in-package (pdf/jbig2.py) and cross-checked against
the reference's embedded table data; `--verify` re-runs the
prefix-freeness check over all fifteen.

The container running the build has no network — downloads are expected
to run on a deployment host. Checksums of the upstream release archive
should be pinned in the deployment's lockfile; this tool verifies
STRUCTURE (parse + chain resolution), which is what the engine needs.
"""

from __future__ import annotations

import argparse
import os
import sys
import urllib.request
import zipfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CMAP_RELEASE = ("https://github.com/adobe-type-tools/cmap-resources/"
                "archive/refs/heads/master.zip")


def fetch(dest: str) -> None:
    os.makedirs(dest, exist_ok=True)
    archive = os.path.join(dest, "cmap-resources.zip")
    print(f"downloading {CMAP_RELEASE} ...")
    urllib.request.urlretrieve(CMAP_RELEASE, archive)  # noqa: S310
    with zipfile.ZipFile(archive) as z:
        members = [m for m in z.namelist() if "/CMap/" in m
                   and not m.endswith("/")]
        for m in members:
            out = os.path.join(dest, *m.split("/")[1:])
            os.makedirs(os.path.dirname(out), exist_ok=True)
            with open(out, "wb") as f:
                f.write(z.read(m))
        print(f"extracted {len(members)} CMap files into {dest}")
    os.unlink(archive)


def verify(dest: str | None) -> int:
    failures = 0
    # 1) JBIG2 standard tables: in-package, always verifiable
    from unipdf_spark.pdf import jbig2

    tables = [getattr(jbig2, f"TABLE_B{i}") for i in range(1, 16)]
    for i, t in enumerate(tables, start=1):
        codes = sorted(t.lookup)
        seen = set()
        for length, code in codes:
            for plen, pcode in seen:
                if plen < length and (code >> (length - plen)) == pcode:
                    print(f"B.{i}: prefix violation {plen}/{pcode} vs "
                          f"{length}/{code}")
                    failures += 1
            seen.add((length, code))
    print(f"JBIG2 Annex B.1-B.15: {len(tables)} tables prefix-free"
          if not failures else f"JBIG2 tables: {failures} violations")

    # 2) Adobe CMap data, when present
    if not dest or not os.path.isdir(dest):
        print("no CMap dir to verify (pass --dest or set "
              "UNIPDF_SPARK_CMAP_DIR); skipping CMap leg")
        return failures
    from unipdf_spark.pdf.fonts import CMap

    names = {}
    for root, _dirs, files in os.walk(dest):
        for fn in files:
            if fn.endswith((".zip", ".md", ".txt")):
                continue
            names[fn] = os.path.join(root, fn)
    n_ok = 0
    uses = []
    for name, path in sorted(names.items()):
        try:
            with open(path, "rb") as f:
                cm = CMap.parse(f.read())
            if not cm.cid_map and not cm.use_cmap and not cm.codespaces:
                raise ValueError("no codespaces/cidranges/usecmap parsed")
            n_ok += 1
            if cm.use_cmap:
                uses.append((name, cm.use_cmap))
        except Exception as e:  # noqa: BLE001
            print(f"PARSE FAIL {name}: {e}")
            failures += 1
    for name, target in uses:
        if target not in names:
            print(f"CHAIN FAIL {name}: usecmap {target} not vendored")
            failures += 1
    print(f"CMap files: {n_ok}/{len(names)} parse; "
          f"{len(uses)} usecmap chains checked")
    os.environ["UNIPDF_SPARK_CMAP_DIR"] = dest
    from unipdf_spark.pdf import cmap_resources

    cmap_resources._dir_scanned = False  # force re-scan of dest
    for probe in ("UniGB-UCS2-H", "UniJIS-UCS2-H"):
        if probe in names:
            cm = cmap_resources.cid_cmap(probe)
            if cm is None or not cm.cid_map:
                print(f"REGISTRY FAIL: {probe} present but not loadable")
                failures += 1
            else:
                print(f"registry loads {probe} ({len(cm.cid_map)} ranges)")
    return failures


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dest", default=os.environ.get("UNIPDF_SPARK_CMAP_DIR"))
    ap.add_argument("--verify", action="store_true",
                    help="verify only, no download")
    args = ap.parse_args()
    if not args.verify:
        if not args.dest:
            ap.error("--dest required for download")
        fetch(args.dest)
    sys.exit(1 if verify(args.dest) else 0)


if __name__ == "__main__":
    main()
