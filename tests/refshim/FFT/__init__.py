# Shim package: exposes the read-only reference sources as importable modules
# for golden parity testing.  (The reference's own __init__ is py2-broken, so
# this package init is intentionally empty.)
