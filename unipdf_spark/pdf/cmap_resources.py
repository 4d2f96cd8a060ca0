"""Predefined CMap resource registry (LoadPredefinedCMap parity,
internal/cmap/cmap.go:66 — the reference compiles the Adobe CMap assets in
and resolves usecmap chains at load).

The real Adobe-registry CID tables (UniGB-UCS2-H, UniJIS-UCS2-H, …) are
public data (Adobe's cmap-resources distribution) but far too large to
transcribe reliably from memory, so this module ships the MACHINERY and
loads the data from the environment:

* ``UNIPDF_SPARK_CMAP_DIR`` — point it at a cmap-resources checkout (any
  directory tree whose files are named exactly after the CMap, e.g.
  ``.../Adobe-GB1-6/CMap/UniGB-UCS2-H``); every file found is registered
  and parsed on first use, including ``usecmap`` chain resolution.
* :func:`register_cmap` — programmatic registration (tests, embedders).

When a predefined non-Identity name is NOT in the registry, fonts.py keeps
the documented identity charcode→CID approximation (text is unaffected —
Uni*-UCS2/UTF16 charcodes ARE the unicode — only /W///W2 width routing
degrades).

A fixture-grade chain (FixtureGB-base-H ← FixtureGB-UCS2-H, real Adobe
CMap syntax, clearly synthetic CID values cid = charcode + 7000 overriding
a +5000 base) ships built-in so the registry path — name lookup, decimal
cid operands, usecmap overlay precedence, /W routing through non-identity
CIDs — is exercised end to end by the `cid_predefined` fixture class in
every driver round, not just when a deployment supplies Adobe data.
"""

from __future__ import annotations

import os

_FIXTURE_BASE = b"""%!PS-Adobe-3.0 Resource-CMap
%%DocumentNeededResources: ProcSet (CIDInit)
/CIDInit /ProcSet findresource begin
12 dict begin
begincmap
/CIDSystemInfo 3 dict dup begin
  /Registry (Fixture) def
  /Ordering (GB1) def
  /Supplement 0 def
end def
/CMapName /FixtureGB-base-H def
/CMapType 1 def
/WMode 0 def
1 begincodespacerange
<0000> <ffff>
endcodespacerange
1 begincidrange
<0000> <7fff> 5000
endcidrange
endcmap
CMapName currentdict /CMap defineresource pop
end
end
"""

_FIXTURE_UCS2 = b"""%!PS-Adobe-3.0 Resource-CMap
%%DocumentNeededResources: ProcSet (CIDInit)
/CIDInit /ProcSet findresource begin
12 dict begin
begincmap
/FixtureGB-base-H usecmap
/CIDSystemInfo 3 dict dup begin
  /Registry (Fixture) def
  /Ordering (GB1) def
  /Supplement 0 def
end def
/CMapName /FixtureGB-UCS2-H def
/CMapType 1 def
/WMode 0 def
1 begincodespacerange
<0000> <ffff>
endcodespacerange
2 begincidrange
<0020> <00ff> 7032
<4e00> <9fff> 26968
endcidrange
endcmap
CMapName currentdict /CMap defineresource pop
end
end
"""

_REGISTRY: dict[str, bytes] = {
    "FixtureGB-base-H": _FIXTURE_BASE,
    "FixtureGB-UCS2-H": _FIXTURE_UCS2,
}
_PARSED: dict[str, object] = {}
_dir_scanned = False


def register_cmap(name: str, data: bytes) -> None:
    """Register raw CMap resource text under its name (invalidates any
    previously parsed form)."""
    _REGISTRY[name] = data
    _PARSED.clear()


def _scan_dir() -> None:
    global _dir_scanned
    if _dir_scanned:
        return
    _dir_scanned = True
    root = os.environ.get("UNIPDF_SPARK_CMAP_DIR")
    if not root or not os.path.isdir(root):
        return
    for dirpath, _dirs, files in os.walk(root):
        for fn in files:
            if fn in _REGISTRY or "." in fn and not fn.endswith(".cmap"):
                continue
            try:
                with open(os.path.join(dirpath, fn), "rb") as fh:
                    head = fh.read(256)
                    if b"CMap" not in head and b"cmap" not in head:
                        continue
                    _REGISTRY[fn.removesuffix(".cmap")] = head + fh.read()
            except OSError:
                continue


def registered(name: str) -> bool:
    _scan_dir()
    return name in _REGISTRY


def cid_cmap(name: str, _depth: int = 0):
    """Parsed CMap for a registered predefined name, with the usecmap
    chain resolved (parents merged under, the child's own ranges winning).
    Returns None for unknown names; chains deeper than 8 are cut."""
    _scan_dir()
    if name in _PARSED:
        return _PARSED[name]
    data = _REGISTRY.get(name)
    if data is None or _depth > 8:
        return None
    from .fonts import CMap

    cm = CMap.parse(data)
    if cm.use_cmap and cm.use_cmap != name:
        base = cid_cmap(cm.use_cmap, _depth + 1)
        if base is not None:
            merged = dict(base.cid_map)
            merged.update(cm.cid_map)
            cm.cid_map = merged
            if not cm.codespaces:
                cm.codespaces = list(base.codespaces)
    _PARSED[name] = cm
    return cm
