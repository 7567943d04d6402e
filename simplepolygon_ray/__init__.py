"""simplepolygon_ray — a Ray-Data-native spatial-join + tiling engine.

Core per-geometry operator reimplements (from scratch, in numpy/Python)
the decomposition semantics of mclaeysb/simplepolygon v2.0.4
(reference at /root/reference, src/index.ts): a complex
(self-/cross-intersecting) polygon is broken into its constituent
simple one-ring polygons annotated with parent / winding / netWinding,
bit-exactly matching the reference's golden GeoJSON fixtures.

Engine layers (all ray.data.Dataset pipelines of map_batches over
Arrow batches):

- ``geom``       : numeric kernels + the decompose operator
- ``cells``      : H3/S2-style hierarchical cell index (own uint64 impl)
- ``images``     : synthetic image+caption table, from-scratch codec,
                   PSNR, perceptual hash
- ``stages``     : Ray Data stages (decompose, covering, PIP join, kNN,
                   tile clipping)
- ``text``       : language-ID, quality scoring, token counts, dedup
                   (exact / MinHash-LSH / SimHash)
- ``ann``        : embedding similarity search (brute cosine / LSH)
- ``relational`` : generic relational operators (filter / groupby /
                   join / sort / top-k) used by the DuckDB oracle gate
- ``state``      : per-partition checkpoint manifests for resume
"""

__version__ = "0.1.0"

from .geom.geojson_io import decompose_feature as simplepolygon  # noqa: E402

__all__ = ["simplepolygon", "__version__"]
