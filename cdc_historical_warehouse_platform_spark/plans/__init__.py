"""Query layer: CDC fixtures derived from the driver testdata, the
reference's analytical/validation query suite, and the TPC-H-shaped
relational coverage queries."""
