"""Curated Google Scanned Objects asset ids for scene generation.

The reference ships a hand-curated list of ~1000 GSO ids grouped by category
(data-gen/kubric_constants.py). This build ships a representative subset of
public GSO asset names; pass ``--asset_list path.txt`` (one id per line) to
`export_kub_mv.py` (or set `CURATED_GSO_ASSETS`) to reproduce the exact
curation used for the published dataset.
"""

CURATED_GSO_ASSETS = [
    # containers / household
    "11pro_SL_TRX_FG", "2_of_Jenga_Classic_Game", "30_CONSTRUCTION_SET",
    "5_HTP", "AllergenFree_JarroDophilus", "Android_Figure_Orange",
    "Animal_Planet_Foam_2Headed_Dragon", "BALANCING_CACTUS",
    "BUILD_A_ROBOT", "Baby_Elements_Stacking_Cups",
    "Breyer_Horse_Of_The_Year_2015", "CASTLE_BLOCKS",
    "CHICKEN_RACER", "COAST_GUARD_BOAT", "CREATIVE_BLOCKS_35_MM",
    "Cole_Hardware_Bowl_Scirocco_YellowBlue",
    "Cole_Hardware_Butter_Dish_Square_Red",
    "Cole_Hardware_Deep_Bowl_Good_Earth_1075",
    "Cole_Hardware_Electric_Pot_Assortment_55",
    "Cole_Hardware_Flower_Pot_1025",
    "Cole_Hardware_Mug_Classic_Blue",
    "Cole_Hardware_Orchid_Pot_85",
    "Cole_Hardware_School_Bell_Solid_Brass_38",
    "Craftsman_Grip_Screwdriver_Phillips_Cushion",
    "Crayola_Crayons_24_count",
    "Dino_3", "Dino_4", "Dino_5",
    "Ecoforms_Garden_Pot_GP16ATurquois",
    "Ecoforms_Plant_Container_QP6CORAL",
    "Ecoforms_Plant_Container_Urn_55_Avocado",
    "FAIRY_TALE_BLOCKS", "FIRE_ENGINE", "FOOD_BEVERAGE_SET",
    "GEOMETRIC_PEG_BOARD", "GIRLS_DECKHAND", "Great_Dinos_Triceratops_Toy",
    "HELICOPTER", "Imaginext_Castle_Ogre",
    "JBL_Charge_Speaker_portable_wireless_wired",
    "KID_ROOM_FURNITURE_SET_1", "KITCHEN_FURNITURE_SET_1",
    "LACING_SHEEP", "LEGO_Bricks_More_Creative_Suitcase",
    "Lenovo_Yoga_2_11", "MINI_EXCAVATOR", "MINI_FIRE_ENGINE",
    "MONKEY_BOWLING", "My_First_Rolling_Lion", "My_First_Wiggle_Crocodile",
    "NESCAFE_NESCAFE_TC_STKS_DECAF_6_CT",
    "Nintendo_Mario_Action_Figure", "Nintendo_Yoshi_Action_Figure",
    "Olive_Kids_Birdie_Lunch_Box", "PARENT_ROOM_FURNITURE_SET_1",
    "PEPSI_NEXT_CACRV", "Pokmon_Conquest_Nintendo_DS_Game",
    "RJ_Rabbit_Easter_Basket_Blue", "Racoon", "Reebok_ALLYLYNN",
    "Reebok_DMX_MAX_PLUS_RAINWALKER", "Room_Essentials_Bowl_Turquiose",
    "Room_Essentials_Mug_White_Yellow", "SANDWICH_MEAL", "SCHOOL_BUS",
    "STACKING_BEAR", "STACKING_RING", "Schleich_African_Black_Rhino",
    "Schleich_Allosaurus", "Schleich_Bald_Eagle",
    "Schleich_Hereford_Bull", "Schleich_Lion_Action_Figure",
    "Schleich_S_Bayala_Unicorn_70432", "Schleich_Spinosaurus_Action_Figure",
    "Schleich_Therizinosaurus_ln9cruulPqc", "Sonny_School_Bus",
    "Squirrel", "Squirt_Strain_Fruit_Basket", "Superman_Battle_of_Smallville",
    "TOP_TEN_HI", "TOWER_TUMBLING", "TURBOPROP_AIRPLANE_WITH_PILOT",
    "Teenage_Mutant_Ninja_Turtles_Rahzar_Action_Figure",
    "Thomas_Friends_Woodan_Railway_Henry", "Threshold_Basket_Natural_Finish",
    "Threshold_Bistro_Ceramic_Dinner_Plate_Ruby_Ring",
    "Threshold_Porcelain_Teapot_White", "Toys_R_Us_Treat_Dispenser",
    "Transformers_Age_of_Extinction_Mega_1Step_Bumblebee_Figure",
    "Vtech_Roll_Learn_Turtle", "Vtech_Stack_Sing_Rings_636_Months",
    "WHALE_WHISTLE_6PCS_SET", "Weisshai_Great_White_Shark", "Whale",
    "Wild_Copper_Mug", "Winning_Moves_1180_Aggravation_Board_Game",
    "ZigZag_Bird_Houses_Set_of_3", "Zebra",
]
