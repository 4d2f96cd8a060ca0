"""Arabic contextual shaping (reference parity: textshaping/textshaping.go:15
ArabicShape, which bidi-orders the text and maps RTL runs to presentation
forms in visual order).

Write-side: :func:`shape` maps logical Arabic to Unicode Arabic
Presentation Forms-B (U+FE70–U+FEFF) with contextual joining
(isolated/initial/medial/final) and the mandatory lam-alef ligatures;
:func:`arabic_shape` adds the per-run visual reordering. Extraction-side
normalization is deliberately INDEPENDENT of these tables: the engine
unshapes via stdlib ``unicodedata`` NFKC (fonts.normalize_presentation_forms)
so writer/engine table bugs cannot cancel out.

Data source: the public Unicode ArabicShaping.txt joining classes and the
Arabic Presentation Forms-B code chart.
"""

from __future__ import annotations

# joining class per Unicode ArabicShaping.txt:
# D = dual-joining, R = right-joining, U = non-joining, C = join-causing
# (tatweel), T = transparent (combining harakat)
JOINING: dict[str, str] = {
    "ء": "U",  # hamza
    "آ": "R", "أ": "R", "ؤ": "R", "إ": "R",
    "ئ": "D",
    "ا": "R",
    "ب": "D",
    "ة": "R",
    "ت": "D", "ث": "D", "ج": "D", "ح": "D",
    "خ": "D",
    "د": "R", "ذ": "R", "ر": "R", "ز": "R",
    "س": "D", "ش": "D", "ص": "D", "ض": "D",
    "ط": "D", "ظ": "D", "ع": "D", "غ": "D",
    "ـ": "C",  # tatweel
    "ف": "D", "ق": "D", "ك": "D", "ل": "D",
    "م": "D", "ن": "D", "ه": "D",
    "و": "R", "ى": "R",
    "ي": "D",
}
JOINING.update({chr(c): "T" for c in range(0x064B, 0x0653)})  # harakat

# (isolated, final, initial, medial) presentation forms; R-type letters
# carry only (isolated, final)
FORMS: dict[str, tuple[str, ...]] = {
    "ء": ("ﺀ",),
    "آ": ("ﺁ", "ﺂ"),
    "أ": ("ﺃ", "ﺄ"),
    "ؤ": ("ﺅ", "ﺆ"),
    "إ": ("ﺇ", "ﺈ"),
    "ئ": ("ﺉ", "ﺊ", "ﺋ", "ﺌ"),
    "ا": ("ﺍ", "ﺎ"),
    "ب": ("ﺏ", "ﺐ", "ﺑ", "ﺒ"),
    "ة": ("ﺓ", "ﺔ"),
    "ت": ("ﺕ", "ﺖ", "ﺗ", "ﺘ"),
    "ث": ("ﺙ", "ﺚ", "ﺛ", "ﺜ"),
    "ج": ("ﺝ", "ﺞ", "ﺟ", "ﺠ"),
    "ح": ("ﺡ", "ﺢ", "ﺣ", "ﺤ"),
    "خ": ("ﺥ", "ﺦ", "ﺧ", "ﺨ"),
    "د": ("ﺩ", "ﺪ"),
    "ذ": ("ﺫ", "ﺬ"),
    "ر": ("ﺭ", "ﺮ"),
    "ز": ("ﺯ", "ﺰ"),
    "س": ("ﺱ", "ﺲ", "ﺳ", "ﺴ"),
    "ش": ("ﺵ", "ﺶ", "ﺷ", "ﺸ"),
    "ص": ("ﺹ", "ﺺ", "ﺻ", "ﺼ"),
    "ض": ("ﺽ", "ﺾ", "ﺿ", "ﻀ"),
    "ط": ("ﻁ", "ﻂ", "ﻃ", "ﻄ"),
    "ظ": ("ﻅ", "ﻆ", "ﻇ", "ﻈ"),
    "ع": ("ﻉ", "ﻊ", "ﻋ", "ﻌ"),
    "غ": ("ﻍ", "ﻎ", "ﻏ", "ﻐ"),
    "ف": ("ﻑ", "ﻒ", "ﻓ", "ﻔ"),
    "ق": ("ﻕ", "ﻖ", "ﻗ", "ﻘ"),
    "ك": ("ﻙ", "ﻚ", "ﻛ", "ﻜ"),
    "ل": ("ﻝ", "ﻞ", "ﻟ", "ﻠ"),
    "م": ("ﻡ", "ﻢ", "ﻣ", "ﻤ"),
    "ن": ("ﻥ", "ﻦ", "ﻧ", "ﻨ"),
    "ه": ("ﻩ", "ﻪ", "ﻫ", "ﻬ"),
    "و": ("ﻭ", "ﻮ"),
    "ى": ("ﻯ", "ﻰ"),
    "ي": ("ﻱ", "ﻲ", "ﻳ", "ﻴ"),
}

# mandatory lam + alef-variant ligatures: (isolated, final)
LAM_ALEF: dict[str, tuple[str, str]] = {
    "آ": ("ﻵ", "ﻶ"),
    "أ": ("ﻷ", "ﻸ"),
    "إ": ("ﻹ", "ﻺ"),
    "ا": ("ﻻ", "ﻼ"),
}

_LAM = "ل"


def shape(text: str) -> str:
    """Logical Arabic → presentation forms with contextual joining.

    Standard algorithm: letter X joins the FOLLOWING letter iff
    class(X) ∈ {D, C} and class(next) ∈ {D, R, C}; it joins the PREVIOUS
    letter iff class(prev) ∈ {D, C} and class(X) ∈ {D, R}. Form:
    both → medial, next-only → initial, prev-only → final, else isolated.
    Transparent (harakat) characters are invisible to the context and
    kept in place; lam+alef pairs collapse to the mandatory ligature.
    Non-Arabic characters pass through unchanged.
    """
    chars = list(text)
    n = len(chars)
    out: list[str] = []
    i = 0

    def nxt_strong(k: int) -> str | None:
        for j in range(k + 1, n):
            if JOINING.get(chars[j]) != "T":
                return chars[j]
        return None

    prev_joins = False  # whether the previous strong char joins forward
    while i < n:
        ch = chars[i]
        c = JOINING.get(ch)
        if c is None:
            out.append(ch)
            prev_joins = False
            i += 1
            continue
        if c == "T":
            out.append(ch)
            i += 1
            continue
        if c == "C":  # tatweel: kept, joins both ways
            out.append(ch)
            prev_joins = True
            i += 1
            continue
        # lam + alef-variant → mandatory ligature
        if ch == _LAM and i + 1 < n and chars[i + 1] in LAM_ALEF:
            iso, fin = LAM_ALEF[chars[i + 1]]
            out.append(fin if prev_joins else iso)
            prev_joins = False  # the ligature's alef side is right-joining
            i += 2
            continue
        join_prev = prev_joins and c in ("D", "R")
        nx = nxt_strong(i)
        join_next = c == "D" and nx is not None and JOINING.get(
            nx, "") in ("D", "R", "C")
        forms = FORMS.get(ch, (ch,))
        if join_prev and join_next:
            out.append(forms[3])
        elif join_next:
            out.append(forms[2])
        elif join_prev and len(forms) > 1:
            out.append(forms[1])
        else:
            out.append(forms[0])
        prev_joins = join_next
        i += 1
    return "".join(out)


def _is_rtl_char(ch: str) -> bool:
    o = ord(ch)
    return 0x0590 <= o <= 0x08FF or 0xFB1D <= o <= 0xFDFF or 0xFE70 <= o <= 0xFEFF


def arabic_shape(text: str) -> str:
    """Reference-parity ArabicShape (textshaping.go:15): contextual-shape
    the RTL runs of a logical string and emit them in visual (reversed)
    order, leaving LTR segments in place. Run segmentation is
    whitespace-word based (first strong character decides), matching the
    engine's bidi pass (layout.py) rather than a full UAX#9
    implementation."""
    words = text.split(" ")
    out: list[str] = []
    i = 0
    n = len(words)

    def is_rtl_word(w: str) -> bool:
        for ch in w:
            if _is_rtl_char(ch):
                return True
            if ch.isalpha():
                return False
        return False

    while i < n:
        if words[i] and is_rtl_word(words[i]):
            j = i
            while j < n and words[j] and is_rtl_word(words[j]):
                j += 1
            out.extend(shape(w)[::-1] for w in reversed(words[i:j]))
            i = j
        else:
            out.append(words[i])
            i += 1
    return " ".join(out)
