from .scenes import SceneBundle, cube_test_scene, smoke_scene, procedural_sky  # noqa: F401
