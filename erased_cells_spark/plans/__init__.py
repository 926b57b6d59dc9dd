"""Plan-shaping helpers: skew salting, partitioning, Spark conf presets."""
