"""py-cpuinfo stub: the reference's select_device only reads 'brand_raw'."""


def get_cpu_info():
    return {"brand_raw": "unknown-cpu"}
