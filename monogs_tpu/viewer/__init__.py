"""Live visualization (web-based; TPU-native replacement for the Open3D GUI)."""
