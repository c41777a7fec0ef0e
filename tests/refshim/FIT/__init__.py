# Stub of the reference's private `FIT` package (HeatPulse_Funcs.py:27).
