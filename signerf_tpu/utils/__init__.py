"""Host-side utilities: image conversion, base64, console logging."""
