"""Sources & sinks: synthetic pages generator, pure-numpy strip-TIFF reader
for the golden rasters, snapshot (manifest) sink with resume."""
