#!/usr/bin/env python3
"""Behavioral-fidelity diff: graft's Spark enrichment functions vs the
reference implementation's own Python functions.

Usage:
  sbt "runMain graft.ParityDump /tmp/parity"
  python3 tools/reference_parity.py /tmp/parity

Imports /root/reference/video_processor.py (read-only, yt_dlp stubbed)
and compares per (title, url): tags, language, language_code, filename
(truncated 80), extension, codec, bitrate, hls flag, truncated name.
"""
import glob, json, sys, types

# the reference imports yt_dlp at module level; stub it (never called —
# we only use the pure enrichment methods)
sys.modules.setdefault("yt_dlp", types.ModuleType("yt_dlp"))
sys.path.insert(0, "/root/reference")
import video_processor  # noqa: E402

p = video_processor.VideoLinkProcessor()
out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/parity"
rows = []
for f in glob.glob(f"{out_dir}/part-*.json"):
    with open(f) as fh:
        for line in fh:
            rows.append(json.loads(line))
assert rows, f"no dump rows found in {out_dir}"

bad = 0
for r in rows:
    title, url = r.get("title", ""), r.get("url", "")
    lang, code = p.guess_language_from_title(title)
    codec, bitrate = p.get_codec_info(url)
    expect = {
        "tags": p.extract_tags_from_title(title),
        "language": lang,
        "language_code": code,
        "filename": p.create_filename(title, url)[:80],
        "ext": p.get_file_extension(url),
        "codec": codec,
        "bitrate": bitrate,
        "hls": 1 if p.is_hls_url(url) else 0,
        "name80": title[:80],
    }
    for k, v in expect.items():
        got = r.get(k, "")
        if got != v:
            bad += 1
            print(f"MISMATCH {k}: title={title!r} url={url!r}\n  spark={got!r}\n  ref  ={v!r}")

print(f"{len(rows)} rows x 9 fields compared; {'PARITY OK' if bad == 0 else f'{bad} mismatches'}")
sys.exit(1 if bad else 0)
