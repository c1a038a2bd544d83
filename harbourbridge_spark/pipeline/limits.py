"""Shared resource limits for the media codecs — a dependency-free
home (the codecs jpeg.py/gif.py import only numpy/struct; importing
the limit from multimodal.py dragged pandas + three pyspark modules
into their import graph, and a re-declared copy drifted 8x before a
code review caught it — import this, never redefine)."""

# Decompression-bomb ceiling for compressed containers (PNG/JPEG/GIF):
# the largest pixel buffer a single decode may inflate. The unfilter /
# entropy loops are Python-serial per row, so the cap also bounds CPU:
# 8 MB ≈ a 1600² truecolor image — far above any fixture, bounded
# work per row.
MAX_DECODED_BYTES = 8 * 1024 * 1024

# Inflate ceiling for ARCHIVE containers (WARC gzip members): the
# image cap is per-decode; an archive legitimately inflates to GBs
# (Common Crawl: ~1 GiB gz -> ~4-5 GiB raw), so it gets its own
# ceiling.  gzip's max ratio is ~1030x, so without a cumulative cap a
# 1 GiB bomb could demand ~1 TB from one executor before the
# bounded-output-frame flushing ever runs.  8 GiB = ~2x the largest
# real crawl archive.
MAX_ARCHIVE_BYTES = 8 << 30
