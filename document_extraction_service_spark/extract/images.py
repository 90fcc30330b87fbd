"""Figure-reference extraction.

Analog of the reference's ImageStrategy
(/root/reference/app/core/extraction_modul/apis/image_api.py and
datamodels/image_models.py) with the geometric 4-side
nearest-neighbour search (J3/J4) collapsed to DOM navigation: the
parser already associated each <img> with its <figure>/<figcaption>
subtree.  What remains is the caption detector (F5: startswith
"fig."/"figure", image_api.py:88-101) and the validator (F9: at most
MAX_CAPTION_SENTENCES grammatical sentences after the name prefix,
image_models.py:102-113).  Cropped-PNG output is replaced by the src
reference per the north_star.
"""

from __future__ import annotations

from . import textops as X


def extract_images(parsed, offsets):
    from .text import anchor_span

    out = []
    for fc in parsed.figures:
        caption = (fc.caption or "").strip()
        if not fc.src or not caption:
            continue  # caption-less figures have no description block (F5)
        low = caption.lstrip().lower()
        m = X.FIGURE_NAME_RE.match(caption)
        if not (low.startswith("fig") and m):
            continue
        body = caption[m.end():]
        n_sent = len(X.split_sentences(body))
        if not 1 <= n_sent <= X.MAX_CAPTION_SENTENCES:
            continue  # F9
        out.append(
            {
                "name": f"Figure {m.group(1)}",
                "src": fc.src,
                "description": caption,
                "span": anchor_span(fc.anchor, offsets),
            }
        )
    return out
