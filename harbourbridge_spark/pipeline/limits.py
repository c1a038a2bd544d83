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
