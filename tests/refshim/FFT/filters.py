# Executes the upstream reference filters module in this namespace
# (test oracle only; scipy + pybaseutils stubs satisfy its imports).
_p = "/root/reference/filters.py"
with open(_p) as _f:
    exec(compile(_f.read(), _p, "exec"))
