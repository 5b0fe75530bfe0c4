"""Offline dataset preprocessing (raw downloads -> pc1.npy/pc2.npy dirs)."""
