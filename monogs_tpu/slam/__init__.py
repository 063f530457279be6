"""SLAM core: tracker (frontend), mapper (backend), keyframing, system."""
