from .simple import SIMPLEConfig, SolveDiagnostics, simple_solve
