"""Command-line entry points (reference L7: train_spatial.py,
train_init_texture.py, train_edit_texture.py, run.sh)."""
