def tqdm(iterable=None, *args, **kwargs):
    return iterable if iterable is not None else []
