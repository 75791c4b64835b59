"""Scene representation, cameras, film, integrators, render driver."""
