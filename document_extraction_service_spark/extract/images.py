"""Figure-reference extraction.

Analog of the reference's ImageStrategy
(/root/reference/app/core/extraction_modul/apis/image_api.py and
datamodels/image_models.py) with the geometric 4-side
nearest-neighbour search (J3/J4) collapsed to DOM navigation: the
parser already associated each <img> with its <figure>/<figcaption>
subtree, and a bare <img> with no figure markup is bound to an
adjacent "Figure N." block (image_api.py:88-101 detects descriptions
on ANY text block; image_models.py:130-229 binds the nearest picture —
here DOM distance replaces geometric distance, greedy WITHOUT
replacement like the table captions, J2).  What remains is the caption
detector (F5: startswith "fig."/"figure", image_api.py:88-101) and the
validator (F9: at most MAX_CAPTION_SENTENCES grammatical sentences
after the name prefix, image_models.py:102-113).  Cropped-PNG output
is replaced by the src reference per the north_star.
"""

from __future__ import annotations

from . import textops as X

# adjacency window for caption<->img binding, in blocks either side of
# the <img> anchor (the reference's geometric bind is distance-bounded,
# image_models.py:130-229)
FIGURE_CAPTION_WINDOW = 2


def _caption_number(caption: str) -> str | None:
    """F5 + F9 caption validation; returns the figure number or None."""
    low = caption.lstrip().lower()
    m = X.FIGURE_NAME_RE.match(caption)
    if not (low.startswith("fig") and m):
        return None
    body = caption[m.end():]
    n_sent = len(X.split_sentences(body))
    if not 1 <= n_sent <= X.MAX_CAPTION_SENTENCES:
        return None  # F9
    return m.group(1)


def extract_images(parsed, offsets):
    from .text import anchor_span

    out = []
    used_caption_blocks: set[int] = set()
    for fc in parsed.figures:
        if not fc.src:
            continue
        caption = (fc.caption or "").strip()
        num = None
        if caption:
            # explicit <figcaption>: validate it; an INVALID explicit
            # caption rejects the figure (F9), no adjacency fallback
            num = _caption_number(caption)
        else:
            # non-markup association: nearest valid "Figure N." block
            # within the window, by DOM distance, forward first (web
            # captions usually follow the image); without replacement
            candidates = []
            for d in range(FIGURE_CAPTION_WINDOW):
                candidates.append(fc.anchor + d)       # following
                candidates.append(fc.anchor - 1 - d)   # preceding
            for k in candidates:
                if 0 <= k < len(parsed.blocks) and k not in used_caption_blocks:
                    cand = parsed.blocks[k].text.strip()
                    n = _caption_number(cand)
                    if n is not None:
                        caption, num = cand, n
                        used_caption_blocks.add(k)
                        break
        if num is None:
            continue
        out.append(
            {
                "name": f"Figure {num}",
                "src": fc.src,
                "description": caption,
                "span": anchor_span(fc.anchor, offsets),
            }
        )
    return out
