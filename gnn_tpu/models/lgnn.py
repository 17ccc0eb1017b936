# placeholder — real implementation lands in the engine milestone
LGNN = None
