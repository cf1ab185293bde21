"""Asset import: OBJ/MTL, glTF/GLB, PNG, KTX2 + merge/bake plumbing."""

from .importer import AssetImporter, ImageImporter, ImportedAssets, load_render_assets

__all__ = ["AssetImporter", "ImageImporter", "ImportedAssets", "load_render_assets"]
