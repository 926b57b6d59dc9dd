"""erased_cells_spark — a from-scratch PySpark-native raster-tiling + spatial-join
engine re-creating the cell semantics of the `erased-cells` Rust crate
(reference: /root/reference, studied for behavior only).

Layers
------
- ``cells``     : pure-numpy kernel — CellType lattice, CellValue, CellBuffer,
                  Mask, MaskedCellBuffer, NoData (reference parity; no Spark).
- ``tiles``     : Arrow/Spark bridge — one DataFrame row per tile, vectorized
                  pandas-UDF kernels (convert / min_max / counts / algebra).
- ``spatial``   : engine-own hierarchical cell index (quad-tree Morton ids),
                  point-in-polygon, kNN, rasterize, zonal stats.
- ``sources``   : synthetic Common-Crawl-style pages generator, pure-numpy
                  strip-TIFF reader for golden files, snapshot (Iceberg-style
                  manifest) sink with resume.
- ``functions`` : text extraction / geocode / lang-id / quality / tokens /
                  fingerprints as vectorized pandas UDFs.
- ``operators`` : dedup (exact / minhash-LSH / simhash / n-gram Jaccard),
                  similarity search (cosine top-k), relational query surface.
"""

__version__ = "0.1.0"
