"""Metadata harvesting.

Analog of the reference's MetadataStrategy
(/root/reference/app/core/extraction_modul/apis/metadata_api.py) with
the Crossref network call (S6, metadata_api.py:212-227) excluded:
everything comes from the page itself — <title>/<meta>/OpenGraph tags,
the html lang attribute, the DOI regex over body text (X1,
metadata_api.py:187-210, longest match wins per O5), and the abstract
chapter (W7, metadata_api.py:96-145) as the description fallback.
"""

from __future__ import annotations

from . import textops as X

# DOI search window: the reference scans the first 2 pages
# (metadata_api.py:187-210); we scan the first N chars of block text.
import re

DOI_SCAN_CHARS = 20_000
DESCRIPTION_MAX_CHARS = 500
# W7 anchor scan: the reference looks at the first pages only
# (metadata_api.py:96-145); we scan the first N blocks.
ABSTRACT_SCAN_BLOCKS = 40
_ABSTRACT_ANCHOR_RE = re.compile(r"(?:abstract|zusammenfassung)\s*[.:—-]\s*", re.I)


def split_author(s: str) -> dict | None:
    """On-page author string -> {first_name, last_name} (reference
    Author, datamodels.py:66-68; the Crossref given/family split,
    metadata_api.py:232-234, replayed from page conventions):
    'Last, First' (the Highwire citation_author convention) splits on
    the comma; 'First [M.] Last' splits on the last space; a single
    token is a bare last name."""
    s = (s or "").strip()
    if not s:
        return None
    if "," in s:
        last, _, first = s.partition(",")
        return {"first_name": first.strip(), "last_name": last.strip()}
    if " " in s:
        first, _, last = s.rpartition(" ")
        return {"first_name": first.strip(), "last_name": last.strip()}
    return {"first_name": "", "last_name": s}


def extract_metadata(parsed, chapters, title_guess, lang_hint):
    meta = parsed.meta

    title = parsed.title or meta.get("og:title", "") or title_guess or ""

    authors: list[dict] = []
    seen_auth: set[tuple[str, str]] = set()
    for a in meta.get("__authors__", []):
        au = split_author(a)
        if au:
            key = (au["first_name"], au["last_name"])
            # (first, last) dedup also collapses the same person given
            # once as 'A. Müller' and once as 'Müller, A.'
            if key not in seen_auth:
                seen_auth.add(key)
                authors.append(au)

    lang = parsed.html_lang or (lang_hint or "")

    # document DOI: explicit citation_doi meta wins; else the longest
    # body-text match (O5, metadata_api.py:187-210) — excluding <cite>
    # reference strings so a cited work's DOI can't shadow the page's
    doi = (meta.get("citation_doi") or meta.get("doi") or "").strip() or None
    if not doi:
        # strip each <cite> string wherever it appears — a cite nested
        # inside a larger block ('1. <cite>…</cite>' list item) must not
        # shadow the page DOI either; whole-block equality missed those.
        # Slack past the window so a cite straddling the truncation
        # boundary is still removed in full.
        max_cite = max((len(c) for c in parsed.cites), default=0)
        scan = "\n".join(b.text for b in parsed.blocks)[:DOI_SCAN_CHARS + max_cite]
        for c in parsed.cites:
            if c:
                scan = scan.replace(c, " ")
        scan = scan[:DOI_SCAN_CHARS]
        dois = X.DOI_RE.findall(scan)
        doi = max(dois, key=len).rstrip(".,;") if dois else None

    publisher = meta.get("og:site_name") or meta.get("publisher") or None

    description = meta.get("description") or meta.get("og:description") or None
    if not description:
        # W7: grow the abstract region from its header anchor — here the
        # chapter whose header names the abstract
        for ch in chapters:
            h = (ch["header"] or "").lower()
            if "abstract" in h or "zusammenfassung" in h:
                first = ch["paragraphs"][0]["sentences"] if ch["paragraphs"] else []
                description = " ".join(first)[:DESCRIPTION_MAX_CHARS] or None
                break
    if not description:
        # W7 anchor-block grow (metadata_api.py:96-145): the reference
        # starts from a line beginning with "Abstract" and grows down.
        # In the DOM the paragraph IS the grown region: take the first
        # early block that *starts with* the keyword and carries real
        # text after it (heading-less "Abstract. We present …" pages).
        for b in parsed.blocks[:ABSTRACT_SCAN_BLOCKS]:
            if b.n_chars > X.BOILER_MAX_CHARS * 4:
                continue
            m = _ABSTRACT_ANCHOR_RE.match(b.text)
            if m and len(b.text) - m.end() >= X.MIN_CHAPTER_CHARS:
                description = b.text[m.end():][:DESCRIPTION_MAX_CHARS]
                break

    # journal / issn / subtitle parity (reference MetaData,
    # datamodels.py:48-69 — Crossref-derived there, harvested from
    # on-page Highwire/citation_* meta tags here)
    journal = meta.get("citation_journal_title") or meta.get("journal") or None
    issn = meta.get("citation_issn") or meta.get("issn") or None
    subtitle = meta.get("citation_subtitle") or meta.get("subtitle") or None

    references = _references(parsed)

    return {
        "title": title or None,
        "subtitle": subtitle,
        "authors": authors,
        "lang": lang or None,
        "doi": doi,
        "publisher": publisher,
        "journal": journal,
        "issn": issn,
        "description": description,
        "references": references,
    }


# citation_reference meta content is ';'-separated k=v pairs
# (Highwire convention): citation_title=...;citation_doi=...
_REF_KV_RE = re.compile(r"\s*citation_([a-z_]+)\s*=\s*([^;]*)")


def _references(parsed) -> list[dict]:
    """On-page reference harvest (reference Reference model,
    datamodels.py:60-64 incl. per-reference authors): repeatable
    citation_reference meta tags, then <cite> elements.  DOI per entry
    via the X1 regex; title is the citation_title pair when present,
    else the raw string minus its DOI; authors from repeatable
    citation_author pairs ('Last, First' convention)."""
    out = []
    seen = set()
    for raw in parsed.meta.get("__refs__", []):
        pairs = _REF_KV_RE.findall(raw) if "citation_" in raw else []
        kv = dict(pairs)
        title = (kv.get("title") or "").strip() or None
        doi_m = X.DOI_RE.findall(kv.get("doi") or raw)
        doi = max(doi_m, key=len).rstrip(".,;") if doi_m else None
        # dict(pairs) collapses repeats — collect EVERY author pair
        ref_authors = [
            a for k, v in pairs if k == "author" and (a := split_author(v))
        ]
        key = (doi, title or raw)
        if key not in seen:
            seen.add(key)
            out.append({"doi": doi, "authors": ref_authors,
                        "title": title, "raw": raw})
    for raw in parsed.cites:
        doi_m = X.DOI_RE.findall(raw)
        doi = max(doi_m, key=len).rstrip(".,;") if doi_m else None
        title = raw
        if doi:
            title = raw.replace(doi, "")
            title = re.sub(r"\bdoi:?\s*$", "", title.strip(" .,;:()[]").strip())
            title = title.strip(" .,;:()[]") or None
        key = (doi, title or raw)
        if key not in seen:
            seen.add(key)
            # free-form <cite> strings carry no structured author pairs
            out.append({"doi": doi, "authors": [], "title": title, "raw": raw})
    return out
