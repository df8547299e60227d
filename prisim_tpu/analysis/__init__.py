"""Analysis stack: delay spectra, CLEAN, power spectra, closure phases."""
