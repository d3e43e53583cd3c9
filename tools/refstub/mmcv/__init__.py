# minimal mmcv stub for reference param counting on CPU
__version__ = '2.1.0'
