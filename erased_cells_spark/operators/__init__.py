"""Engine operators: cell encoding (JVM builtins), point-in-polygon join,
kNN via cell-ring expansion, rasterize-to-tile, zonal stats, dedup family,
similarity search."""
