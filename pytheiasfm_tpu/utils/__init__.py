"""Host-side utilities: synthetic scene generation, timers, GPS conversion."""
