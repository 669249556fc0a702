from acmil_tpu.wsi.slide import Slide, ImageSlide, open_slide, clear_slide_cache

__all__ = ["Slide", "ImageSlide", "open_slide", "clear_slide_cache"]
