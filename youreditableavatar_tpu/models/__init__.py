"""Scene/model layer: SDF fields, meshes, TetGS Gaussian models, cameras."""
