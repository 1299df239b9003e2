"""Pipeline stages: SDF init, spatial editing, texture init/edit."""
